"""Shared compile/export interface for composition elements.

Parity reference: flygym ``compose/base.py:11-35`` (compile → (MjModel, MjData)
via ``mjcf.Physics.from_mjcf_model``; ``save_xml_with_assets``). Here compile
returns the TPU analog: ``(PhysicsModel, State)``.
"""

from abc import ABC, abstractmethod
from os import PathLike
from pathlib import Path

__all__ = ["BaseCompositionElement"]


class BaseCompositionElement(ABC):
    """Base class for anything that owns a :class:`ModelSpec` and can be
    compiled into device arrays."""

    @property
    @abstractmethod
    def spec(self):
        """The underlying :class:`~flygym_tpu.compose.spec.ModelSpec`."""

    def compile(self):
        """Compile to ``(PhysicsModel, State)``.

        The full compile artifacts (name→index maps) are cached on
        ``self.compiled`` for the simulation layer's ID-mapping.
        """
        from flygym_tpu.engine.model import make_initial_state

        self.compiled = self.spec.compile()
        model = self.compiled.model
        state = make_initial_state(model)
        return model, state

    def save_xml_with_assets(self, path: PathLike) -> None:
        """Export the compiled model as a standalone MJCF XML file.

        Unlike the reference (which exports mesh assets alongside), the
        compiled model is fully self-contained: primitive geoms + explicit
        inertial elements.
        """
        Path(path).write_text(self.spec.to_mjcf_xml())
