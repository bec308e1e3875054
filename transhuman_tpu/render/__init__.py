"""Volume-rendering orchestration: point sampling, compositing, the jitted
render pipelines (train one-shot; inference chunk-scan with SMPL culling)."""
