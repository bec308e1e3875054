"""Persistent render serving.

The reference has no serving story: every render is a fresh ``python
run.py`` process that rebuilds the model, reloads the checkpoint and pays
per-frame Python overhead (`/root/reference/run.py:7-55`).  For production
deployment the compile cost must be paid once and frames must stream
through the same pipelined dispatch path the eval CLI uses — so this
module keeps one process alive around a checkpointed
:class:`~transhuman_tpu.cli.run.FrameRenderer` and serves novel-view
render requests over HTTP (stdlib only; no extra dependencies).

Endpoints
---------
``GET /healthz``
    JSON: devices, parameter count, ray bucket, compact ratio.
``GET /stats``
    JSON: render count, latency mean/p50/p95 (ms), overflow fallbacks.
``POST /render``
    Body: an ``.npz`` archive.  Required keys: ``images (V,H,W,3)``
    (float in [0,1] or uint8), per-view ``K/R/T``, a target camera
    ``tK (3,3) / tR (3,3) / tT (3,)``, and the body geometry as either

    * ``verts_world (Nv,3)`` + ``blend_rot (Nv,3,3)``, or
    * SMPL parameters ``poses (72,)`` + ``shapes (10,)`` (the server runs
      its SMPL model — requests are then a few hundred bytes of geometry).

    Optional: ``masks (V,H,W)`` (background filled like the training inputs:
    white if ``cfg.white_bkgd`` else black, gated on ``cfg.mask_bkgd``),
    ``vizmaps (V,Nv)`` (default all-visible), ``Rh (3,3)`` / ``Th (3,)``
    (default identity), ``H/W`` scalars (default cfg render resolution).
    Reply: ``.npz`` with ``rgb (H,W,3)``, ``depth (H,W)``, ``acc (H,W)``,
    or a PNG of ``rgb`` with ``POST /render?format=png``.

Concurrency model: HTTP threads enqueue onto a bounded queue consumed by
ONE executor thread (TPU programs execute serially anyway); the executor
dispatches request i+1 before fetching request i — the same software
pipelining as ``cli/run.py::_pipelined`` — so host work (decode, PNG
encode) overlaps device compute and a full queue is natural backpressure.
"""

from __future__ import annotations

import io
import json
import os
import queue
import sys
import threading
import time
from collections import deque
from concurrent.futures import Future
from concurrent.futures import TimeoutError as FuturesTimeout
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from .config import Config
from .data.ray_sampling import sample_eval_rays
from .geometry.rays import world_bounds
from .render.pipeline import FrameInputs


class RequestError(ValueError):
    """Bad client payload (mapped to HTTP 400)."""


class OverloadedError(RuntimeError):
    """Server saturated (mapped to HTTP 503 + Retry-After): the request was
    well-formed; a retry against a less-loaded replica is the right move,
    so it must NOT be reported as a 4xx client error."""


def _as_f32(d, key, shape_hint=None):
    if key not in d:
        raise RequestError(f"missing required array {key!r}"
                           + (f" {shape_hint}" if shape_hint else ""))
    try:
        return np.asarray(d[key], np.float32)
    except (ValueError, TypeError) as e:
        raise RequestError(f"array {key!r} is not numeric: {e}") from e


def _shaped(d, key, shape):
    """_as_f32 + reshape with client-error (HTTP 400) semantics."""
    a = _as_f32(d, key, str(shape))
    try:
        return a.reshape(shape)
    except ValueError as e:
        raise RequestError(
            f"{key} has shape {a.shape}; cannot reshape to {shape}") from e


def parse_render_request(arrays: dict, cfg: Config, smpl) -> tuple:
    """npz dict -> (FrameInputs, target camera tuple, (H, W)).

    Mirrors the dataset's frame assembly (`data/zju.py::_build_frame`):
    background mask-out, world AABB inflation (z-only unless cfg.big_box),
    smpl-coordinate target verts derived as (verts_world - Th) @ Rh.
    """
    imgs = _as_f32(arrays, "images", "(V,H,W,3)")
    if imgs.ndim != 4 or imgs.shape[-1] != 3:
        raise RequestError(f"images must be (V,H,W,3), got {imgs.shape}")
    src_kind = np.asarray(arrays["images"]).dtype
    if src_kind.kind in "iu":
        # ANY integer dtype is a [0, max] image (uint8 from cv2, uint16
        # from 16-bit PNG pipelines, ...); feeding raw 0..65535 values to
        # the encoder as if they were [0,1] floats renders garbage with a
        # 200 OK (same class of bug as the encode_jpeg uint16 clip)
        imgs = imgs / float(np.iinfo(src_kind).max)
    v = imgs.shape[0]
    K = _shaped(arrays, "K", (v, 3, 3))
    R = _shaped(arrays, "R", (v, 3, 3))
    T = _shaped(arrays, "T", (v, 3))
    if "masks" in arrays:
        m = np.asarray(arrays["masks"]) != 0
        if m.shape != imgs.shape[:3]:
            raise RequestError(
                f"masks {m.shape} must match images[:3] {imgs.shape[:3]}")
        if cfg.mask_bkgd:
            # same background fill the training inputs saw (data/zju.py:258)
            bg = 1.0 if cfg.white_bkgd else 0.0
            imgs = np.where(m[..., None], imgs, np.float32(bg))

    Rh = (_shaped(arrays, "Rh", (3, 3)) if "Rh" in arrays
          else np.eye(3, dtype=np.float32))
    Th = (_shaped(arrays, "Th", (3,)) if "Th" in arrays
          else np.zeros(3, np.float32))

    if "verts_world" in arrays:
        verts_world = _shaped(arrays, "verts_world", (-1, 3))
        blend_rot = _shaped(arrays, "blend_rot", (-1, 3, 3))
        if blend_rot.shape[0] != verts_world.shape[0]:
            raise RequestError("blend_rot rows != verts_world rows")
    elif "poses" in arrays:
        # pin the documented shapes HERE: a 66-element poses array must be
        # a 400, not a 500 from a bare reshape deep inside SMPLModel
        n_shape = smpl.shapedirs.shape[-1]
        verts_smpl, _, blend = smpl(
            _shaped(arrays, "poses", (72,)),
            _shaped(arrays, "shapes", (n_shape,)),
        )
        # zju stores world verts; smpl coords are (w - Th) @ Rh, so
        # w = smpl @ Rh.T + Th (data/zju.py:388)
        verts_world = (verts_smpl @ Rh.T + Th).astype(np.float32)
        blend_rot = blend[:, :3, :3].astype(np.float32)
    else:
        raise RequestError(
            "need either verts_world+blend_rot or poses+shapes")
    nv = verts_world.shape[0]
    if nv != smpl.v_template.shape[0]:
        raise RequestError(
            f"verts_world has {nv} vertices; the served model uses "
            f"{smpl.v_template.shape[0]}")

    vizmaps = (_shaped(arrays, "vizmaps", (v, nv)) if "vizmaps" in arrays
               else np.ones((v, nv), np.float32))
    verts_smpl_t = ((verts_world - Th) @ Rh).astype(np.float32)

    frame = FrameInputs(
        images=imgs.astype(np.float32), vizmaps=vizmaps, K=K, R=R, T=T,
        verts_world=verts_world.astype(np.float32),
        tar_verts_smpl=verts_smpl_t, blend_rot=blend_rot,
        Rh=Rh, Th=Th,
    )

    tK = _shaped(arrays, "tK", (3, 3))
    tR = _shaped(arrays, "tR", (3, 3))
    tT = _shaped(arrays, "tT", (3,))
    def _scalar_int(key, default):
        if key not in arrays:
            return default
        try:
            return int(np.asarray(arrays[key]).reshape(()))
        except (ValueError, TypeError) as e:
            raise RequestError(f"{key} must be a scalar int: {e}") from e

    H = _scalar_int("H", cfg.H_render)
    W = _scalar_int("W", cfg.W_render)
    if not (8 <= H <= 8192 and 8 <= W <= 8192):
        raise RequestError(f"unreasonable resolution {H}x{W}")
    return frame, (tK, tR, tT), (H, W)


class RenderService:
    """Owns the compiled pipeline + checkpoint; thread-safe via the queue
    in :class:`RenderServer` (this class itself is single-threaded)."""

    def __init__(self, cfg: Config, pipe, params, smpl):
        from .cli.run import FrameRenderer

        self.cfg = cfg
        self.pipe = pipe
        self.params = params
        self.smpl = smpl
        self.renderer = FrameRenderer(cfg, pipe)
        self.n_rendered = 0
        # bounded: the process is built to stay resident for weeks
        self.latencies_ms: "deque" = deque(maxlen=1024)

    # -- single-request path (also the unit-test surface) ---------------
    def dispatch(self, arrays: dict):
        frame, (tK, tR, tT), (H, W) = parse_render_request(
            arrays, self.cfg, self.smpl)
        er = sample_eval_rays(
            None, tK, tR, tT.reshape(3, 1),
            world_bounds(frame.verts_world, self.cfg.big_box),
            hw=(H, W),  # no GT image exists; don't allocate a dummy one
        )
        if er.rays.ray_o.shape[0] == 0:
            raise RequestError(
                "target camera sees no part of the body AABB")
        dev = self.renderer.dispatch(self.params, frame, er)
        return dev, er, (H, W)

    def fetch(self, dispatched) -> dict:
        dev, er, (H, W) = dispatched
        out = self.renderer.fetch(self.params, dev, er)
        rgb = np.zeros((H * W, 3), np.float32)
        depth = np.zeros(H * W, np.float32)
        acc = np.zeros(H * W, np.float32)
        rgb[er.pix_idx] = out["rgb_map"]
        depth[er.pix_idx] = out["depth_map"]
        acc[er.pix_idx] = out["acc_map"]
        if self.cfg.white_bkgd:
            rgb[~er.mask_at_box] = 1.0
        self.n_rendered += 1
        return {
            "rgb": rgb.reshape(H, W, 3),
            "depth": depth.reshape(H, W),
            "acc": acc.reshape(H, W),
        }

    def render(self, arrays: dict) -> dict:
        return self.fetch(self.dispatch(arrays))

    def warmup(self, H: int, W: int, n_views: int = 3):
        """Pay the compile for (n_views, bucket, config) before the first
        request.  The jit signature keys on the VIEW COUNT and the padded
        RAY BUCKET (ceil(n_masked/pad_bucket)): a request with a different
        view count, or whose camera/body coverage lands in a different
        bucket than this warmup's T-pose at 2.5 m, still pays its own
        compile (minutes through the tunnel) on first occurrence — pass the
        production view count via main()'s cfg.test.input_view, and expect
        one-off latency spikes on new buckets."""
        nv = self.smpl.v_template.shape[0]
        verts, _, blend = self.smpl(np.zeros(72), np.zeros(10))
        focal = 0.9 * max(H, W)
        K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]],
                     np.float32)
        req = {
            "images": np.zeros((n_views, H, W, 3), np.float32),
            "K": np.tile(K, (n_views, 1, 1)),
            "R": np.tile(np.eye(3, dtype=np.float32), (n_views, 1, 1)),
            "T": np.tile(np.array([0, 0, 2.5], np.float32), (n_views, 1)),
            "verts_world": verts.astype(np.float32),
            "blend_rot": blend[:, :3, :3].astype(np.float32),
            "tK": K, "tR": np.eye(3, dtype=np.float32),
            "tT": np.array([0, 0, 2.5], np.float32),
            "H": H, "W": W,
        }
        t0 = time.perf_counter()
        self.render(req)
        self.n_rendered -= 1  # warmup doesn't count
        print(f"serve: warmup render {H}x{W} compiled+ran in "
              f"{time.perf_counter() - t0:.1f}s")

    def stats(self) -> dict:
        # list() snapshots the deque in one C call (atomic under the GIL);
        # the executor thread appends concurrently
        lat = np.asarray(list(self.latencies_ms), np.float64)
        q = (lambda p: float(np.percentile(lat, p))) if lat.size else (
            lambda p: 0.0)
        return {
            "renders": self.n_rendered,
            "overflow_fallbacks": self.renderer.n_fallbacks,
            "latency_ms": {
                "mean": float(lat.mean()) if lat.size else 0.0,
                "p50": q(50), "p95": q(95),
            },
        }


_STOP = object()


class RenderServer:
    """HTTP front + single pipelined executor thread."""

    def __init__(self, service: RenderService, host="127.0.0.1", port=0,
                 max_queue: int = 8):
        self.service = service
        self._q: "queue.Queue" = queue.Queue(maxsize=max_queue)
        self._worker = threading.Thread(target=self._run, daemon=True)
        handler = _make_handler(self)
        self.httpd = ThreadingHTTPServer((host, port), handler)
        self.port = self.httpd.server_address[1]

    # -- executor --------------------------------------------------------
    def _run(self):
        """Pipelined: dispatch request i+1 before fetching request i
        (cli/run.py::_pipelined schedule, degree 2)."""
        svc = self.service
        prev = None  # (future, dispatched, t_enqueue)
        stopping = False
        while True:
            if stopping and prev is None:
                return
            try:
                item = (self._q.get(timeout=0.05) if (prev or stopping)
                        else self._q.get())
            except queue.Empty:
                item = None
            if item is _STOP:
                stopping = True
                item = None
            cur = None
            if item is not None:
                fut, arrays, t0 = item
                # a client whose .result() timed out cancels its future;
                # skip the abandoned render instead of burning device time
                # on it exactly when the server is saturated
                if not fut.set_running_or_notify_cancel():
                    continue
                try:
                    cur = (fut, svc.dispatch(arrays), t0)
                except Exception as e:  # noqa: BLE001 — goes to the client
                    fut.set_exception(e)
            if prev is not None:
                fut, dispatched, t0 = prev
                try:
                    out = svc.fetch(dispatched)
                    svc.latencies_ms.append(
                        (time.perf_counter() - t0) * 1e3)
                    fut.set_result(out)
                except Exception as e:  # noqa: BLE001
                    fut.set_exception(e)
            prev = cur

    def submit(self, arrays: dict) -> Future:
        fut: Future = Future()
        try:
            self._q.put((fut, arrays, time.perf_counter()), timeout=30)
        except queue.Full:
            fut.set_exception(
                OverloadedError("render queue full — server overloaded"))
        return fut

    # -- lifecycle -------------------------------------------------------
    def start(self):
        self._worker.start()
        threading.Thread(target=self.httpd.serve_forever, daemon=True).start()

    def serve_forever(self):
        self._worker.start()
        self.httpd.serve_forever()

    def shutdown(self):
        self.httpd.shutdown()
        # never block on a full queue (the worker may be wedged mid-compile
        # or dead): shed queued work with a retryable error until the STOP
        # sentinel fits — bounded by the queue size, then by the join cap
        while True:
            try:
                self._q.put_nowait(_STOP)
                break
            except queue.Full:
                try:
                    item = self._q.get_nowait()
                except queue.Empty:
                    continue
                if item is not _STOP and not item[0].cancelled():
                    item[0].set_exception(
                        OverloadedError("server shutting down"))
        if self._worker.is_alive():
            self._worker.join(timeout=60)


def _make_handler(server: RenderServer):
    class Handler(BaseHTTPRequestHandler):
        # quiet default request logging; stats carry the signal
        def log_message(self, fmt, *args):  # noqa: D102
            pass

        def _json(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802
            if self.path == "/healthz":
                import jax

                svc = server.service
                n_params = sum(
                    int(np.prod(x.shape))
                    for x in jax.tree_util.tree_leaves(svc.params))
                self._json(200, {
                    "status": "ok",
                    "devices": [str(d) for d in jax.devices()],
                    "n_params": n_params,
                    "ray_bucket": svc.renderer.bucket,
                    "compact_ratio": svc.pipe.compact_ratio,
                })
            elif self.path == "/stats":
                self._json(200, server.service.stats())
            else:
                self._json(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):  # noqa: N802
            path, _, query = self.path.partition("?")
            if path != "/render":
                self._json(404, {"error": f"unknown path {path}"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                if n <= 0 or n > 1 << 31:
                    raise RequestError(f"bad Content-Length {n}")
                try:
                    arrays = dict(np.load(io.BytesIO(self.rfile.read(n)),
                                          allow_pickle=False))
                except Exception as e:  # malformed client bytes -> 400
                    raise RequestError(f"body is not a readable npz: {e}")
                fut = server.submit(arrays)
                try:
                    out = fut.result(timeout=600)
                except FuturesTimeout:
                    # abandon the render: if the worker hasn't started it,
                    # the cancel lets it skip the dead work entirely
                    fut.cancel()
                    raise OverloadedError(
                        "render timed out after 600 s (server saturated "
                        "or compiling)")
            except RequestError as e:
                self._json(400, {"error": str(e)})
                return
            except OverloadedError as e:
                # retryable server condition: 503 + Retry-After, NOT a 4xx
                # (clients/load balancers must shed to a replica, not treat
                # the request as permanently malformed)
                body = json.dumps({"error": str(e)}).encode()
                self.send_response(503)
                self.send_header("Retry-After", "30")
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            except Exception as e:  # noqa: BLE001 — surfaced, not hidden
                self._json(500, {"error": f"{type(e).__name__}: {e}"})
                return
            if query == "format=png":
                import imageio.v2 as imageio

                png = imageio.imwrite(
                    "<bytes>",
                    np.clip(out["rgb"] * 255, 0, 255).astype(np.uint8),
                    format="png")
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.send_header("Content-Length", str(len(png)))
                self.end_headers()
                self.wfile.write(png)
                return
            buf = io.BytesIO()
            np.savez_compressed(buf, **out)
            body = buf.getvalue()
            self.send_response(200)
            self.send_header("Content-Type", "application/octet-stream")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    return Handler


def main(argv=None) -> int:
    from .cli.common import build_runtime, model_dir, parse_args

    args = list(sys.argv[1:] if argv is None else argv)

    def _opt(flag, default):
        if flag in args:
            i = args.index(flag)
            if i + 1 >= len(args):
                raise SystemExit(f"{flag} requires a value")
            val = args[i + 1]
            del args[i:i + 2]
            return val
        return default

    host = _opt("--host", "127.0.0.1")
    port = int(_opt("--port", "8008"))
    no_warmup = "--no_warmup" in args
    if no_warmup:
        args.remove("--no_warmup")

    _, cfg = parse_args(args)
    from .train.checkpoint import load_checkpoint

    ckpt = load_checkpoint(model_dir(cfg), cfg.test.epoch)
    if ckpt is None:
        raise FileNotFoundError(f"no checkpoint in {model_dir(cfg)}")
    # build_runtime loads the SMPL model itself when smpl=None
    model, pipe, smpl, _ = build_runtime(cfg, pe_table=ckpt.get("pe_table"))
    params, epoch = ckpt["params"], ckpt["epoch"]
    print(f"serve: checkpoint epoch {int(epoch)}, "
          f"exp {cfg.exp_name!r}, {host}:{port}")

    svc = RenderService(cfg, pipe, params, smpl)
    if not no_warmup:
        # compile for the production view count (jit keys on it)
        svc.warmup(cfg.H_render, cfg.W_render,
                   n_views=max(1, len(cfg.test.input_view)))
    server = RenderServer(svc, host=host, port=port)
    print(f"serve: listening on http://{host}:{server.port}  "
          "(GET /healthz, GET /stats, POST /render)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
