"""Frame-sequence -> mp4 assembly (parity: gen_freeview_video.py)."""

from __future__ import annotations

import os
import re
import sys
from typing import List

import numpy as np


def _numeric_key(name: str):
    """Natural sort key: 'frame10000.png' must come AFTER 'frame9999.png'
    even when the zero padding widens past %04d (lexical sort would splice
    frames 10000+ before 9999 in very long sequences)."""
    return [int(t) if t.isdigit() else t for t in re.split(r"(\d+)", name)]


def frames_to_video(frame_dir: str, out_path: str, fps: int = 30) -> str:
    """Encode the sorted PNG frames of `frame_dir` into out_path.  Uses
    imageio's ffmpeg backend when present; otherwise falls back to the
    dependency-free MJPG/AVI writer (`viz/avi.py`), returning the actual
    path written (`.avi` in the fallback)."""
    frames: List[str] = sorted(
        (f for f in os.listdir(frame_dir) if f.endswith(".png")),
        key=_numeric_key,
    )
    if not frames:
        raise ValueError(f"no frames in {frame_dir}")
    import imageio.v2 as imageio

    paths = [os.path.join(frame_dir, f) for f in frames]
    try:
        with imageio.get_writer(out_path, fps=fps) as w:
            for f in paths:
                w.append_data(imageio.imread(f))
        return out_path
    except Exception as e:
        # Surface WHAT failed before falling back: the mp4 attempt can die
        # for reasons other than a missing ffmpeg backend (corrupt frame,
        # odd h264 dimensions, mixed sizes) and silently re-encoding as AVI
        # would send the user debugging a nonexistent ffmpeg problem.
        print(f"mp4 encode failed ({type(e).__name__}: {e}); "
              "falling back to MJPG/AVI", file=sys.stderr)
        # imageio creates/truncates out_path before the first append; a
        # partial mp4 next to the fallback avi would look like the artifact
        if os.path.exists(out_path):
            try:
                os.remove(out_path)
            except OSError:
                pass
        from .avi import MJPGWriter

        def rgb(img):
            # normalize to (H, W, 3): a 2-D grayscale PNG sliced with
            # [..., :3] would lose COLUMNS, not channels
            if img.ndim == 2:
                img = np.stack([img] * 3, axis=-1)
            return img[..., :3]

        first = rgb(imageio.imread(paths[0]))
        avi_path = os.path.splitext(out_path)[0] + ".avi"
        with MJPGWriter(avi_path, first.shape[1], first.shape[0], fps) as w:
            w.append(first)  # frame 0 already decoded for the dims
            for f in paths[1:]:
                w.append(rgb(imageio.imread(f)))
        return avi_path


def main(argv=None):
    """Standalone frames->mp4 tool (parity: gen_freeview_video.py CLI)."""
    import argparse

    p = argparse.ArgumentParser(description=frames_to_video.__doc__)
    p.add_argument("frame_dir")
    p.add_argument("out_path")
    p.add_argument("--fps", type=int, default=30)
    a = p.parse_args(argv)
    out = frames_to_video(a.frame_dir, a.out_path, fps=a.fps)
    if out != a.out_path:
        print(f"no ffmpeg backend; wrote MJPG/AVI instead: {out}")
    else:
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
