"""Offline renderer: camera management, time-gated frame capture, video export.

Parity reference: flygym ``rendering.py`` (Renderer :16-268: multi-camera,
``render_as_needed`` time gating, frame buffering, notebook display, mp4
export) and ``warp/rendering.py`` (multi-world frame buffers, world selection,
grid montage with world-ID overlay :21-276).

One class covers both the single-world and batched cases: frames are rendered
by the XLA raycaster (render/raycast.py) and buffered on host.
"""

from os import PathLike
from pathlib import Path
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from flygym_tpu.compose.spec import CameraSpec
from flygym_tpu.engine.model import PhysicsModel, State
from flygym_tpu.render.raycast import render_pixels

__all__ = ["Renderer", "launch_interactive_viewer", "preview_model"]


def _load_texture(tex):
    """Normalize a texture argument to an (H, W, 3) float32 array in [0, 1].

    Accepts None, an array (float [0,1] or uint8, RGB/RGBA/grayscale), or an
    image-file path (loaded via matplotlib, which is already a dependency of
    utils/plot.py).
    """
    if tex is None:
        return None
    if isinstance(tex, (str, PathLike)):
        from matplotlib.image import imread

        tex = imread(str(tex))
    tex = np.asarray(tex)
    if tex.dtype == np.uint8:
        tex = tex.astype(np.float32) / 255.0
    tex = tex.astype(np.float32)
    if tex.ndim == 2:  # grayscale
        tex = np.repeat(tex[:, :, None], 3, axis=2)
    if tex.shape[-1] == 4:  # RGBA
        tex = tex[..., :3]
    if tex.ndim != 3 or tex.shape[-1] != 3:
        raise ValueError(f"Texture must be (H, W, 3); got shape {tex.shape}")
    return jnp.asarray(tex)


class Renderer:
    """Raycasting renderer with reference-compatible frame gating.

    Args:
        model: Compiled physics model.
        world: The composed world (for camera lookup by name).
        cameras: Camera name, CameraSpec, or a sequence of either.
        camera_res: (height, width) pixels.
        playback_speed: Video playback speed relative to real time.
        output_fps: Output video frame rate.
        buffer_frames: Keep rendered frames in memory.
        world_ids: For batched states, which worlds to render (default [0]).
    """

    def __init__(
        self,
        model: PhysicsModel,
        world,
        cameras,
        *,
        camera_res: tuple[int, int] = (240, 320),
        playback_speed: float = 0.2,
        output_fps: int = 25,
        buffer_frames: bool = True,
        world_ids: Sequence[int] | None = None,
        mesh_fidelity: bool = False,
        ground_texture=None,
        ground_texture_period: float = 10.0,
        sky_texture=None,
        lights: Sequence[dict] | None = None,
        **kwargs: Any,
    ) -> None:
        self.model = model
        self.world = world
        self.camera_res = tuple(camera_res)
        self.playback_speed = playback_speed
        self.output_fps = output_fps
        self.buffer_frames = buffer_frames
        self.world_ids = list(world_ids) if world_ids is not None else [0]

        if not isinstance(cameras, (list, tuple)):
            cameras = [cameras]
        self.cameras: list[CameraSpec] = [self._resolve_camera(c) for c in cameras]
        self.camera_names = [c.full_identifier for c in self.cameras]

        # Geoms rendered: capsules only (planes handled analytically).
        capsule_mask = np.array(
            [1.0 if t in ("capsule", "sphere") else 0.0 for t in model.geom_types], np.float32
        )
        self._capsule_mask = jnp.asarray(capsule_mask)

        # Mesh-fidelity mode: sphere-trace the true anatomical mesh SDFs
        # on top of the capsule broad-phase (render/sdf.py; the analog of
        # the reference's MuJoCo-GL mesh rendering). Requires the
        # sdf_meshes.npz asset and the compile-time geom name map.
        self._sdf_pack = None
        if mesh_fidelity:
            from flygym_tpu.render.sdf import build_sdf_pack

            compiled = getattr(world, "compiled", None)
            if compiled is None:
                raise ValueError(
                    "mesh_fidelity=True needs a compiled world "
                    "(call world.compile() first)."
                )
            self._sdf_pack = build_sdf_pack(model, compiled.geom_name2id)
            if self._sdf_pack is None:
                raise FileNotFoundError(
                    "sdf_meshes.npz asset not found — run "
                    "scripts/dev/derive_sdf_assets.py to bake the mesh "
                    "SDF grids."
                )
        # Image textures (the analog of MuJoCo GL file textures,
        # reference ``rendering.py:16-268``): arrays or image-file paths.
        self._ground_texture = _load_texture(ground_texture)
        self._ground_texture_period = float(ground_texture_period)
        self._sky_texture = _load_texture(sky_texture)
        # Scene lights (the analog of MuJoCo scene lights; the reference's
        # batch renderer adds per-fly overhead lights,
        # ``warp/rendering.py:385-441``). Each spec: kind
        # "directional" (dir=travel direction) or "point" (pos, falloff mm);
        # color (scalar or RGB); optional specular; cast_shadow (default
        # True); and for point lights an optional target body name whose
        # world position (plus offset) the light follows every frame.
        self._lights = None
        if lights is not None:
            self._lights = tuple(
                self._resolve_light(dict(li)) for li in lights
            )

        self._render_fn = jax.jit(self._render_one_camera, static_argnums=(0,))
        # One device call renders all selected worlds (the reference's GPU
        # batch renderer semantics, ``warp/rendering.py:279-341``) instead
        # of a host loop per world.
        self._render_fn_batch = jax.jit(
            jax.vmap(self._render_one_camera, in_axes=(None, 0)),
            static_argnums=(0,),
        )
        self._world_ids_idx = jnp.asarray(self.world_ids, jnp.int32)

        self._frames: dict[str, list] = {name: [] for name in self.camera_names}
        self._last_render_time = -np.inf
        self._eps = 1e-9

    # -- camera resolution ------------------------------------------------

    def _resolve_camera(self, camera) -> CameraSpec:
        if isinstance(camera, CameraSpec):
            return camera
        if isinstance(camera, str):
            for fly in self.world.fly_lookup.values():
                if camera in fly.cameraname_to_speccamera:
                    return fly.cameraname_to_speccamera[camera]
            for cam in self.world.spec.cameras:
                if cam.name == camera or cam.full_identifier == camera:
                    return cam
            raise ValueError(f"Camera '{camera}' not found in the world.")
        raise TypeError(f"Invalid camera spec: {camera!r}")

    def _resolve_light(self, li: dict) -> dict:
        """Normalize a user light spec to static fields + jnp arrays."""
        kind = li.get("kind", "directional")
        if kind not in ("directional", "point"):
            raise ValueError(f"Unknown light kind {kind!r}")
        color = np.asarray(li.get("color", 0.5), np.float32)
        if color.ndim == 0:
            color = np.full((3,), float(color), np.float32)
        out = {
            "kind": kind,
            "color": jnp.asarray(color),
            "cast_shadow": bool(li.get("cast_shadow", True)),
            "falloff": float(li.get("falloff", 30.0)),
            "target_id": None,
            "offset": jnp.asarray(
                np.asarray(li.get("offset", (0.0, 0.0, 0.0)), np.float32)
            ),
        }
        if "specular" in li:
            spec = np.asarray(li["specular"], np.float32)
            if spec.ndim == 0:
                spec = np.full((3,), float(spec), np.float32)
            out["specular"] = jnp.asarray(spec)
        target = li.get("target")
        if target is not None:
            if kind != "point":
                raise ValueError("Only point lights can track a target body")
            name2id = self.world.compiled.body_name2id
            if target not in name2id:
                raise ValueError(
                    f"Light target body {target!r} not found in the world "
                    f"(valid names look like 'flyname/c_thorax')."
                )
            out["target_id"] = name2id[target]
            out["vec"] = None
        else:
            key = "dir" if kind == "directional" else "pos"
            if key not in li and "vec" not in li:
                raise ValueError(f"Light needs {key!r} (or a target body)")
            out["vec"] = jnp.asarray(
                np.asarray(li.get(key, li.get("vec")), np.float32)
            )
        return out

    def _concrete_lights(self, state: State):
        """Per-frame light list: resolve target-tracking point lights
        against the current body positions."""
        if self._lights is None:
            return None
        out = []
        for li in self._lights:
            li = dict(li)
            tid = li.pop("target_id")
            offset = li.pop("offset")
            if tid is not None:
                li["vec"] = state.xpos[tid] + offset
            out.append(li)
        return tuple(out)

    def _camera_pose(self, cam: CameraSpec, state: State):
        """Camera world pose per MuJoCo camera-mode semantics.

        - ``fixed``: pos/quat as specified.
        - ``track``: position follows the target body (constant world-frame
          offset), orientation fixed — MuJoCo ``mode="track"``, the
          reference's tracking camera (``fly.py:471-505``).
        - ``targetbody``/``targetbodycom``: position as specified,
          orientation re-aimed at the target body every frame.
        """
        pos = jnp.asarray(cam.pos, jnp.float32)
        quat = jnp.asarray(cam.quat, jnp.float32)
        if cam.target is None or cam.mode == "fixed":
            return pos, quat
        target_id = self.world.compiled.body_name2id[cam.target]
        target = state.xpos[target_id]
        if cam.mode == "track":
            return target + pos, quat
        if cam.mode in ("targetbody", "targetbodycom"):
            # Look-at: camera -z axis toward the target, world +z as up.
            from flygym_tpu.engine.maths import mat_to_quat

            fwd = target - pos
            fwd = fwd / jnp.maximum(jnp.linalg.norm(fwd), 1e-9)
            up_w = jnp.array([0.0, 0.0, 1.0], jnp.float32)
            right = jnp.cross(fwd, up_w)
            rn = jnp.linalg.norm(right)
            # Degenerate (looking straight up/down): fall back to +x right.
            right = jnp.where(
                rn > 1e-6, right / jnp.maximum(rn, 1e-9),
                jnp.array([1.0, 0.0, 0.0], jnp.float32),
            )
            up = jnp.cross(right, fwd)
            R = jnp.stack([right, up, -fwd], axis=1)  # columns: x, y, z
            return pos, mat_to_quat(R)
        return pos, quat

    def _render_one_camera(self, cam_index: int, state: State):
        cam = self.cameras[cam_index]
        pos, quat = self._camera_pose(cam, state)
        from flygym_tpu.engine.kinematics import geom_poses

        gpos, gquat = geom_poses(self.model, state.xpos, state.xquat)
        h, w = self.camera_res
        return render_pixels(
            self.model,
            gpos,
            gquat,
            pos,
            quat,
            h,
            w,
            cam.fovy,
            self._capsule_mask,
            sdf_pack=self._sdf_pack,
            ground_texture=self._ground_texture,
            ground_texture_period=self._ground_texture_period,
            sky_texture=self._sky_texture,
            lights=self._concrete_lights(state),
        )

    # -- public API --------------------------------------------------------

    @property
    def render_interval(self) -> float:
        """Simulated seconds between frames."""
        return 1.0 / (self.output_fps / self.playback_speed)

    def render_as_needed(self, state: State) -> bool:
        """Render if sim time advanced past the next frame boundary
        (reference ``rendering.py:81-101``)."""
        time = np.asarray(state.time)
        sim_time = float(time.flat[0])
        if sim_time < self._last_render_time + self.render_interval - self._eps:
            return False
        self.render(state)
        self._last_render_time = sim_time
        return True

    def render(self, state: State) -> dict[str, np.ndarray]:
        """Render all cameras now. For batched states, renders the selected
        ``world_ids``; frames are (n_selected, H, W, 3) uint8."""
        # Single-world Simulation has scalar time; ANY leading axis means a
        # batched state (including n_worlds == 1, whose size is also 1).
        batched = np.asarray(state.time).ndim > 0
        out = {}
        for ci, name in enumerate(self.camera_names):
            if batched:
                # Gather the selected worlds and render them in ONE vmapped
                # device call.
                sub = jax.tree.map(lambda x: x[self._world_ids_idx], state)
                frame = np.asarray(self._render_fn_batch(ci, sub))
            else:
                frame = np.asarray(self._render_fn(ci, state))
            frame = (np.clip(frame, 0, 1) * 255).astype(np.uint8)
            out[name] = frame
            if self.buffer_frames:
                self._frames[name].append(frame)
        return out

    def get_frames(self, camera: str | None = None, world_id: int | None = None):
        """Buffered frames for a camera (default: first camera)."""
        name = camera or self.camera_names[0]
        frames = self._frames[name]
        if world_id is not None:
            sel = self.world_ids.index(world_id)
            return [f[sel] for f in frames]
        return frames

    def reset(self) -> None:
        """Clear buffered frames and the render clock."""
        self._frames = {name: [] for name in self.camera_names}
        self._last_render_time = -np.inf

    def save_video(
        self,
        path: PathLike,
        camera: str | None = None,
        world_id: int | None = None,
    ) -> None:
        """Export buffered frames as a video (reference ``rendering.py:125-172``)."""
        from flygym_tpu.utils.video import write_video

        frames = self.get_frames(camera, world_id)
        if frames and frames[0].ndim == 4:
            frames = [f[0] for f in frames]  # first selected world by default
        write_video(Path(path), frames, fps=self.output_fps)

    def show_in_notebook(self, camera: str | None = None, **kwargs: Any) -> None:
        """Display buffered frames inline in a Jupyter notebook
        (reference ``rendering.py:125-147``, mediapy ``show_video``).

        Uses mediapy when available; otherwise falls back to an embedded
        base64 mp4 via IPython. Raises a helpful error outside notebooks.
        """
        cameras = [camera] if camera else self.camera_names
        for name in cameras:
            frames = self.get_frames(name)
            if not frames:
                raise RuntimeError(f"No frames recorded yet for camera '{name}'.")
            if frames[0].ndim == 4:  # batched: show world 0
                frames = [f[0] for f in frames]
            try:
                import mediapy

                mediapy.show_video(
                    frames, fps=self.output_fps, title=name, **kwargs
                )
                continue
            except ImportError:
                pass
            try:
                import base64
                import tempfile
                from pathlib import Path as _Path

                from IPython.display import HTML, display

                from flygym_tpu.utils.video import write_video

                # Go through write_video (a real temp file, not BytesIO:
                # imageio's in-memory writer cannot resolve the mp4 format
                # and raises ValueError) so the pad-to-16 / gif-fallback
                # logic is shared with save_video.
                with tempfile.TemporaryDirectory() as td:
                    out = _Path(td) / "clip.mp4"
                    write_video(out, frames, fps=self.output_fps)
                    real = out if out.exists() else out.with_suffix(".gif")
                    mime = "video/mp4" if real.suffix == ".mp4" else "image/gif"
                    b64 = base64.b64encode(real.read_bytes()).decode("ascii")
                tag = (
                    f'<video controls autoplay loop src='
                    f'"data:{mime};base64,{b64}"></video>'
                    if mime == "video/mp4"
                    else f'<img src="data:{mime};base64,{b64}">'
                )
                display(HTML(f"<div><b>{name}</b><br>{tag}</div>"))
            except Exception as e:
                raise RuntimeError(
                    "Notebook display needs mediapy or IPython+imageio; "
                    "use save_video(path) instead."
                ) from e

    def save_video_grid(self, path: PathLike, camera: str | None = None) -> None:
        """Multi-world grid montage video with world-ID overlays
        (reference ``warp/rendering.py:141-262``)."""
        from flygym_tpu.utils.video import montage_grid, write_video

        name = camera or self.camera_names[0]
        frames = self._frames[name]
        grid_frames = [montage_grid(f, self.world_ids) for f in frames]
        write_video(Path(path), grid_frames, fps=self.output_fps)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


def preview_model(
    world,
    camera="trackcam",
    *,
    duration_s: float = 0.02,
    camera_res=(240, 320),
    save_path: PathLike | None = None,
):
    """Short rollout + render (reference ``rendering.py:300-351``).

    Returns the last rendered frame as (H, W, 3) uint8.
    """
    from flygym_tpu.simulation import Simulation

    sim = Simulation(world)
    renderer = sim.set_renderer(camera, camera_res=camera_res)
    sim.warmup(duration_s)
    frames = renderer.render(sim.state)
    frame = next(iter(frames.values()))
    if save_path is not None:
        from PIL import Image

        Image.fromarray(frame).save(save_path)
    return frame


def launch_interactive_viewer(
    world, run_async: bool = False, init_keyframe: str | None = "neutral"
):
    """Launch MuJoCo's built-in interactive viewer on the composed world
    (reference ``rendering.py:271-297``).

    The compiled model exports as standalone MJCF (primitive geoms +
    explicit inertials), which the stock MuJoCo viewer loads directly — so
    interactive inspection works anywhere ``mujoco`` + a GL display are
    available (a workstation install), with no TPU involved.

    Args:
        world: A composed world (any :class:`BaseCompositionElement`).
        run_async: Launch in a separate process and return immediately
            (use from Jupyter notebooks).
        init_keyframe: Keyframe to reset to before launching ("neutral" —
            the only keyframe the composer maintains — or None for the
            model's default state).
    """
    import os
    import sys

    headless_msg = (
        "Interactive viewing needs the `mujoco` package (pip install "
        "mujoco) and a display. On headless hosts, use "
        "preview_model(world) for offline frames or "
        "world.save_xml_with_assets(path) and open the MJCF elsewhere."
    )
    if sys.platform.startswith("linux") and not (
        os.environ.get("DISPLAY") or os.environ.get("WAYLAND_DISPLAY")
    ):
        # GLFW hangs/aborts rather than failing cleanly without a display.
        raise RuntimeError(headless_msg)
    try:
        import mujoco
        import mujoco.viewer
    except ImportError as e:  # pragma: no cover - env-dependent
        raise RuntimeError(headless_msg) from e

    mj_model = mujoco.MjModel.from_xml_string(world.spec.to_mjcf_xml())
    mj_data = mujoco.MjData(mj_model)
    if init_keyframe is not None and mj_model.nkey > 0:
        key_id = mujoco.mj_name2id(
            mj_model, mujoco.mjtObj.mjOBJ_KEY, init_keyframe
        )
        if key_id >= 0:
            mujoco.mj_resetDataKeyframe(mj_model, mj_data, key_id)

    if run_async:
        from multiprocessing import Process

        p = Process(target=mujoco.viewer.launch, args=(mj_model, mj_data))
        p.start()  # don't join — the viewer owns its own lifetime
        return p
    mujoco.viewer.launch(mj_model, mj_data)
