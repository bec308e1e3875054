"""Render-serving tests (tiny synthetic scene, CPU).

Covers the request parser (geometry both as explicit verts and as SMPL
params), the render service output contract, and a real HTTP round-trip
through the pipelined executor (npz + png replies, health/stats, errors).
"""

import io
import json
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

from transhuman_tpu.config import Config
from transhuman_tpu.serve import (
    RenderServer,
    RenderService,
    RequestError,
    parse_render_request,
)
from transhuman_tpu.testing import init_params, synthetic_setup

HW = 32


@pytest.fixture(scope="module")
def service():
    # H_render/W_render are derived (H*ratio): 64 * 0.5 = HW
    cfg = Config().merge_opts(
        ["pad_bucket", "64", "H", str(HW * 2), "W", str(HW * 2), "ratio", "0.5"]
    )
    model, pipe, frame, smpl, cluster = synthetic_setup(
        n_views=2, image_hw=(HW, HW), n_verts=120, n_clusters=12,
        n_samples=8, chunk_rays=8, embed_dim=24, vit_depth=2, vit_heads=2,
        knn_k=4,
    )
    params = init_params(model, frame, 12, jax.random.PRNGKey(0))
    svc = RenderService(cfg, pipe, params, smpl)
    return svc, frame, smpl


def _request_arrays(frame, target_view=0):
    return {
        "images": np.asarray(frame.images),
        "K": np.asarray(frame.K),
        "R": np.asarray(frame.R),
        "T": np.asarray(frame.T),
        "verts_world": np.asarray(frame.verts_world),
        "blend_rot": np.asarray(frame.blend_rot),
        "tK": np.asarray(frame.K[target_view]),
        "tR": np.asarray(frame.R[target_view]),
        "tT": np.asarray(frame.T[target_view]),
        "H": HW, "W": HW,
    }


def test_render_with_explicit_verts(service):
    svc, frame, _ = service
    out = svc.render(_request_arrays(frame))
    assert out["rgb"].shape == (HW, HW, 3)
    assert out["depth"].shape == (HW, HW)
    assert out["acc"].shape == (HW, HW)
    for v in out.values():
        assert np.isfinite(v).all()
    assert float(np.abs(out["acc"]).sum()) > 0.0
    assert svc.n_rendered == 1


def test_render_with_smpl_params(service):
    """poses/shapes geometry == explicit-verts geometry (the synthetic frame
    was built from smpl(0, 0) with Rh=I, Th=0)."""
    svc, frame, _ = service
    base = svc.render(_request_arrays(frame))
    req = _request_arrays(frame)
    del req["verts_world"], req["blend_rot"]
    req["poses"] = np.zeros(72, np.float32)
    req["shapes"] = np.zeros(10, np.float32)
    out = svc.render(req)
    np.testing.assert_allclose(out["rgb"], base["rgb"], atol=1e-5)


def test_render_ray_sharded_matches_single_device(service):
    """Serving honors cfg.mesh_axis_rays > 1 (VERDICT r4 stretch): the
    FrameRenderer path shards the request's rays over a device mesh
    (parallel/infer.py) — outputs equal the single-device service on the
    virtual CPU mesh, including the overflow-fallback plumbing."""
    svc, frame, smpl = service
    base = svc.render(_request_arrays(frame))

    cfg2 = svc.cfg.merge_dict({"mesh_axis_rays": 2})
    svc2 = RenderService(cfg2, svc.pipe, svc.params, smpl)
    out = svc2.render(_request_arrays(frame))
    for k in ("rgb", "depth", "acc"):
        np.testing.assert_allclose(out[k], base[k], atol=1e-5)
    assert svc2.renderer.n_fallbacks == 0


def test_uint8_images_and_masks(service):
    svc, frame, smpl = service
    req = _request_arrays(frame)
    req["images"] = (np.asarray(frame.images) * 255).astype(np.uint8)
    req["masks"] = np.ones(np.asarray(frame.images).shape[:3], np.uint8)
    f, _, _ = parse_render_request(req, svc.cfg, smpl)
    np.testing.assert_allclose(
        np.asarray(f.images), np.asarray(frame.images), atol=1 / 254.0
    )
    # zero mask -> background fill, honoring white_bkgd (data/zju.py:258)
    req["masks"] = np.zeros(np.asarray(frame.images).shape[:3], np.uint8)
    f, _, _ = parse_render_request(req, svc.cfg, smpl)
    assert float(np.abs(np.asarray(f.images)).sum()) == 0.0
    white_cfg = svc.cfg.merge_opts(["white_bkgd", "True"])
    f, _, _ = parse_render_request(req, white_cfg, smpl)
    assert np.all(np.asarray(f.images) == 1.0)
    nomask_cfg = svc.cfg.merge_opts(["mask_bkgd", "False"])
    f, _, _ = parse_render_request(req, nomask_cfg, smpl)
    np.testing.assert_allclose(
        np.asarray(f.images), np.asarray(frame.images), atol=1 / 254.0
    )


def test_bad_shapes_are_request_errors(service):
    """Wrong-shaped arrays must map to HTTP 400, not 500."""
    svc, frame, smpl = service
    req = _request_arrays(frame)
    req["K"] = np.asarray(frame.K)[:1]  # 1 K for 2 views
    with pytest.raises(RequestError, match="reshape"):
        parse_render_request(req, svc.cfg, smpl)
    req = _request_arrays(frame)
    req["tT"] = np.zeros((4,), np.float32)
    with pytest.raises(RequestError, match="reshape"):
        parse_render_request(req, svc.cfg, smpl)


@pytest.mark.parametrize("drop, msg", [
    ("images", "images"),
    ("tK", "tK"),
    ("blend_rot", "verts_world"),  # drops into the needs-geometry error
])
def test_bad_requests(service, drop, msg):
    svc, frame, smpl = service
    req = _request_arrays(frame)
    del req[drop]
    if drop == "blend_rot":
        del req["verts_world"]
    with pytest.raises(RequestError, match=msg):
        parse_render_request(req, svc.cfg, smpl)


def test_wrong_vertex_count(service):
    svc, frame, smpl = service
    req = _request_arrays(frame)
    req["verts_world"] = np.zeros((7, 3), np.float32)
    req["blend_rot"] = np.tile(np.eye(3, dtype=np.float32), (7, 1, 1))
    with pytest.raises(RequestError, match="vertices"):
        parse_render_request(req, svc.cfg, smpl)


def test_malformed_scalars_and_geometry_are_request_errors(service):
    """H as a string / poses of the wrong length must be 400s, not 500s
    from bare int()/reshape failures deep in the stack."""
    svc, frame, smpl = service
    req = _request_arrays(frame)
    req["H"] = np.asarray("tall")  # npz can carry string arrays
    with pytest.raises(RequestError, match="scalar int"):
        parse_render_request(req, svc.cfg, smpl)
    req = _request_arrays(frame)
    req["W"] = np.asarray([32, 32])  # multi-element
    with pytest.raises(RequestError, match="scalar int"):
        parse_render_request(req, svc.cfg, smpl)
    req = _request_arrays(frame)
    del req["verts_world"], req["blend_rot"]
    req["poses"] = np.zeros(66, np.float32)  # 66 != 72
    req["shapes"] = np.zeros(10, np.float32)
    with pytest.raises(RequestError, match="poses"):
        parse_render_request(req, svc.cfg, smpl)
    req["poses"] = np.zeros(72, np.float32)
    req["shapes"] = np.zeros(12, np.float32)  # 12 != 10
    with pytest.raises(RequestError, match="shapes"):
        parse_render_request(req, svc.cfg, smpl)


def test_uint16_images_are_rescaled(service):
    """Any integer dtype is a [0, max] image; uint16 must not pass through
    as raw 0..65535 'floats' (garbage render with a 200)."""
    svc, frame, smpl = service
    req = _request_arrays(frame)
    img01 = np.clip(np.asarray(frame.images), 0, 1)
    req["images"] = (img01 * 65535).astype(np.uint16)
    f, _, _ = parse_render_request(req, svc.cfg, smpl)
    assert float(np.abs(f.images).max()) <= 1.0
    np.testing.assert_allclose(
        np.asarray(f.images), img01, atol=1 / 65534.0)


def test_overload_and_shutdown_are_bounded(service):
    """Queue-full -> OverloadedError (503, retryable) and shutdown never
    blocks on a full queue (worker wedged/dead)."""
    import threading

    from transhuman_tpu.serve import OverloadedError

    svc, frame, _ = service
    server = RenderServer(svc, port=0, max_queue=1)
    # start ONLY the http thread; the never-started worker models a wedged
    # executor, so the queue stays full deterministically
    threading.Thread(target=server.httpd.serve_forever, daemon=True).start()
    good = _request_arrays(frame)
    fut1 = server.submit(good)       # occupies the single slot
    fut2 = server.submit(good)       # queue full -> immediate overload
    with pytest.raises(OverloadedError, match="queue full"):
        fut2.result(timeout=1)
    assert fut1.cancel()             # client timed out and abandoned it
    # shutdown must shed the remaining (cancelled) item and return promptly
    # (put(_STOP) used to block forever behind the full queue)
    server.shutdown()
    server.httpd.server_close()
    assert fut1.cancelled()


def test_worker_skips_cancelled_requests(service):
    """A request whose client already timed out (cancelled future) must not
    burn device time: the worker skips it and serves the live one."""
    svc, frame, _ = service
    server = RenderServer(svc, port=0, max_queue=4)
    good = _request_arrays(frame)
    dead = server.submit(good)
    assert dead.cancel()             # abandoned before the worker starts
    live = server.submit(good)
    n0 = svc.n_rendered
    server._worker.start()           # worker only; no http needed here
    out = live.result(timeout=300)
    assert out["rgb"].shape == (HW, HW, 3)
    assert svc.n_rendered == n0 + 1  # the dead request was never rendered
    assert dead.cancelled()
    from transhuman_tpu.serve import _STOP

    server._q.put(_STOP)
    server._worker.join(timeout=60)
    server.httpd.server_close()


def test_http_roundtrip(service):
    svc, frame, _ = service
    server = RenderServer(svc, port=0)
    server.start()
    base = f"http://127.0.0.1:{server.port}"
    try:
        health = json.loads(urllib.request.urlopen(
            base + "/healthz", timeout=30).read())
        assert health["status"] == "ok" and health["n_params"] > 0

        buf = io.BytesIO()
        np.savez(buf, **_request_arrays(frame))
        body = buf.getvalue()
        ref = svc.render(_request_arrays(frame))

        reply = urllib.request.urlopen(
            urllib.request.Request(base + "/render", data=body), timeout=120
        ).read()
        out = dict(np.load(io.BytesIO(reply)))
        np.testing.assert_allclose(out["rgb"], ref["rgb"], atol=1e-5)

        png = urllib.request.urlopen(
            urllib.request.Request(base + "/render?format=png", data=body),
            timeout=120,
        )
        assert png.headers["Content-Type"] == "image/png"
        import imageio.v2 as imageio

        img = imageio.imread(png.read())
        assert img.shape[:2] == (HW, HW)

        stats = json.loads(urllib.request.urlopen(
            base + "/stats", timeout=30).read())
        assert stats["renders"] >= 2
        assert stats["latency_ms"]["p50"] > 0

        # malformed payload -> 400 (client error, not server fault)
        bad = urllib.request.Request(base + "/render", data=b"not an npz")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=30)
        assert ei.value.code == 400
        assert json.loads(urllib.request.urlopen(
            base + "/healthz", timeout=30).read())["status"] == "ok"
    finally:
        server.shutdown()
