"""Frame-sequence -> mp4 assembly (parity: gen_freeview_video.py)."""

from __future__ import annotations

import os
from typing import List


def frames_to_video(frame_dir: str, out_path: str, fps: int = 30) -> str:
    """Encode the sorted PNG frames of `frame_dir` into out_path.  Uses
    imageio's ffmpeg backend; if no encoder is available, leaves the PNG
    sequence in place and returns the directory instead."""
    frames: List[str] = sorted(
        f for f in os.listdir(frame_dir) if f.endswith(".png")
    )
    if not frames:
        raise ValueError(f"no frames in {frame_dir}")
    try:
        import imageio.v2 as imageio

        with imageio.get_writer(out_path, fps=fps) as w:
            for f in frames:
                w.append_data(imageio.imread(os.path.join(frame_dir, f)))
        return out_path
    except Exception:
        return frame_dir
