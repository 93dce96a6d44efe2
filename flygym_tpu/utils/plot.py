"""Plotting helpers: locate a usable TrueType font for image overlays.

Parity reference: flygym ``utils/plot.py:1-19``.
"""

from pathlib import Path

__all__ = ["find_font"]

_FONT_DIRS = [
    Path("/usr/share/fonts"),
    Path("/usr/local/share/fonts"),
    Path.home() / ".fonts",
]


def find_font(preferred: str = "DejaVuSans") -> str | None:
    """Return a path to a TTF font, preferring the given family name."""
    candidates = []
    for base in _FONT_DIRS:
        if base.is_dir():
            candidates.extend(base.rglob("*.ttf"))
    for path in candidates:
        if preferred.lower() in path.stem.lower():
            return str(path)
    return str(candidates[0]) if candidates else None
