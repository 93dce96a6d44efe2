from flygym_tpu.render.renderer import (
    Renderer,
    launch_interactive_viewer,
    preview_model,
)

__all__ = ["Renderer", "launch_interactive_viewer", "preview_model"]
