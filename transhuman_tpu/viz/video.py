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


def main(argv=None):
    """Standalone frames->mp4 tool (parity: gen_freeview_video.py CLI)."""
    import argparse

    p = argparse.ArgumentParser(description=frames_to_video.__doc__)
    p.add_argument("frame_dir")
    p.add_argument("out_path")
    p.add_argument("--fps", type=int, default=30)
    a = p.parse_args(argv)
    out = frames_to_video(a.frame_dir, a.out_path, fps=a.fps)
    if out == a.frame_dir:
        print(f"no video encoder available; PNG frames left in {out}")
    else:
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
