"""Video export and frame montage helpers.

Parity reference: flygym ``utils/video.py:9-37`` (mp4 writer with pad-to-16
resize) and ``warp/rendering.py:141-262`` (multi-world grid montage with
world-ID overlay).
"""

from pathlib import Path

import numpy as np

__all__ = ["write_video", "montage_grid"]


def _pad_to_multiple_of_16(frame: np.ndarray) -> np.ndarray:
    """Pad H/W to multiples of 16 (libx264 requirement)."""
    h, w = frame.shape[:2]
    ph = (-h) % 16
    pw = (-w) % 16
    if ph == 0 and pw == 0:
        return frame
    return np.pad(frame, ((0, ph), (0, pw), (0, 0)), mode="edge")


def write_video(path: Path, frames: list[np.ndarray], fps: int = 25) -> None:
    """Write frames (H, W, 3) uint8 to an mp4 (gif fallback)."""
    if not frames:
        raise ValueError("No frames to write.")
    frames = [_pad_to_multiple_of_16(np.asarray(f)) for f in frames]
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    import imageio.v2 as imageio

    try:
        imageio.mimwrite(path, frames, fps=fps)
    except Exception:
        # No ffmpeg available: fall back to GIF next to the requested path.
        gif_path = path.with_suffix(".gif")
        imageio.mimwrite(gif_path, frames, duration=1000 / fps)


def montage_grid(frames: np.ndarray, world_ids: list[int]) -> np.ndarray:
    """Tile (n, H, W, 3) frames into a near-square grid with ID overlays."""
    from PIL import Image, ImageDraw

    n, h, w = frames.shape[:3]
    cols = int(np.ceil(np.sqrt(n)))
    rows = int(np.ceil(n / cols))
    grid = np.zeros((rows * h, cols * w, 3), np.uint8)
    for i in range(n):
        r, c = divmod(i, cols)
        tile = Image.fromarray(frames[i])
        draw = ImageDraw.Draw(tile)
        draw.text((4, 4), f"world {world_ids[i]}", fill=(255, 255, 255))
        grid[r * h : (r + 1) * h, c * w : (c + 1) * w] = np.asarray(tile)
    return grid
