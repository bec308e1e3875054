"""Output visualizers: free-viewpoint frames, mesh export, video assembly.

Lazy re-exports (PEP 562) so `python -m transhuman_tpu.viz.video` does not
pre-import the module through the package (runpy double-import warning).
"""

_EXPORTS = {
    "PerformVisualizer": "perform",
    "frames_to_video": "video",
    "MJPGWriter": "avi",
}


def __getattr__(name):
    if name in _EXPORTS:
        import importlib

        mod = importlib.import_module(f".{_EXPORTS[name]}", __name__)
        return getattr(mod, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
