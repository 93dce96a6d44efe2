"""Tests for the raycasting renderer: frames, time gating, buffering, video.

Modeled on the reference's renderer tests (flygym ``tests/core/test_simulation.py``
renderer smoke tests + ``tests/warp/test_rendering.py`` frame buffering and
world selection) — but running on the CPU backend.
"""

import numpy as np
import pytest

import flygym_tpu
from flygym_tpu.anatomy import AxisOrder, JointPreset, Skeleton
from flygym_tpu.compose import Fly, FlatGroundWorld, KinematicPosePreset
from flygym_tpu.render.raycast import camera_rays
from flygym_tpu.utils.math import Rotation3D

FLY = "renderfly"


@pytest.fixture(scope="module")
def world():
    fly = Fly(name=FLY)
    fly.add_joints(
        Skeleton(axis_order=AxisOrder.YPR, joint_preset=JointPreset.LEGS_ONLY),
        neutral_pose=KinematicPosePreset.NEUTRAL,
    )
    fly.colorize()
    fly.add_tracking_camera()
    world = FlatGroundWorld()
    world.add_fly(fly, (0, 0, 2.0), Rotation3D("quat", (1, 0, 0, 0)))
    return world


@pytest.fixture(scope="module")
def sim(world):
    return flygym_tpu.Simulation(world)


class TestCameraRays:
    def test_shapes_and_norm(self):
        rays = np.asarray(camera_rays(24, 32, 45.0))
        assert rays.shape == (24, 32, 3)
        assert np.allclose(np.linalg.norm(rays, axis=-1), 1.0, atol=1e-6)

    def test_center_ray_forward(self):
        rays = np.asarray(camera_rays(25, 33, 45.0))
        assert np.allclose(rays[12, 16], [0, 0, -1], atol=0.03)


class TestRenderer:
    def test_render_frame(self, sim):
        sim.reset()
        renderer = sim.set_renderer("trackcam", camera_res=(60, 80))
        frames = renderer.render(sim.state)
        frame = next(iter(frames.values()))
        assert frame.shape == (60, 80, 3)
        assert frame.dtype == np.uint8
        # The scene must show variation (fly + checkered ground + sky).
        assert frame.std() > 10

    def test_fly_visible_in_frame(self, sim):
        sim.reset()
        renderer = sim.set_renderer("trackcam", camera_res=(60, 80))
        frame = next(iter(renderer.render(sim.state).values()))
        # Center region should differ from the sky color at the top.
        sky = frame[0, :5].mean(axis=(0, 1))
        center = frame[25:40, 30:50].mean(axis=(0, 1))
        assert np.abs(sky - center).max() > 10

    def test_render_as_needed_gating(self, sim):
        sim.reset()
        renderer = sim.set_renderer(
            "trackcam", camera_res=(24, 32), playback_speed=0.2, output_fps=25
        )
        renderer.reset()
        n_rendered = 0
        # interval = 1/(25/0.2) = 8 ms sim time = 80 steps at dt 1e-4.
        for _ in range(170):
            sim.step()
            if sim.render_as_needed():
                n_rendered += 1
        assert n_rendered == 3  # t=0 (first), t=8ms, t=16ms
        assert len(renderer.get_frames()) == 3

    def test_reset_clears_buffer(self, sim):
        sim.reset()
        renderer = sim.set_renderer("trackcam", camera_res=(24, 32))
        renderer.render(sim.state)
        assert len(renderer.get_frames()) == 1
        renderer.reset()
        assert len(renderer.get_frames()) == 0

    def test_unknown_camera_raises(self, sim):
        with pytest.raises(ValueError):
            sim.set_renderer("nonexistent_cam")

    def test_save_video(self, sim, tmp_path):
        sim.reset()
        renderer = sim.set_renderer("trackcam", camera_res=(24, 32))
        for _ in range(3):
            renderer.render(sim.state)
        out = tmp_path / "video.mp4"
        renderer.save_video(out)
        assert out.exists() or out.with_suffix(".gif").exists()


class TestBatchRendering:
    def test_batched_world_selection(self, world):
        bsim = flygym_tpu.BatchSimulation(world, 3)
        renderer = bsim.set_renderer(
            "trackcam", camera_res=(24, 32), world_ids=[0, 2]
        )
        frames = renderer.render(bsim.state)
        frame = next(iter(frames.values()))
        assert frame.shape == (2, 24, 32, 3)
        # Identical worlds → identical renders.
        assert np.array_equal(frame[0], frame[1])

    def test_single_world_batch_renders(self, world):
        """n_worlds == 1 is still a BATCHED state: a leading axis, frames
        (1, H, W, 3). Regression: batch detection once keyed on size > 1
        and indexed the unbatched path with a batched state."""
        bsim = flygym_tpu.BatchSimulation(world, 1)
        renderer = bsim.set_renderer(
            "trackcam", camera_res=(24, 32), world_ids=[0]
        )
        frames = renderer.render(bsim.state)
        frame = next(iter(frames.values()))
        assert frame.shape == (1, 24, 32, 3)

    def test_targetbody_camera_aims_at_fly(self):
        """``targetbody`` mode re-aims the camera at the target every frame
        (MuJoCo camera semantics; ``track`` keeps orientation fixed)."""
        fly = Fly(name=FLY)
        fly.add_joints(
            Skeleton(axis_order=AxisOrder.YPR, joint_preset=JointPreset.LEGS_ONLY),
            neutral_pose=KinematicPosePreset.NEUTRAL,
        )
        fly.add_tracking_camera(
            name="aimcam", mode="targetbody", pos_offset=(0, -10, 4), fovy=40
        )
        world = FlatGroundWorld()
        # Spawn far from the camera's default aim direction.
        world.add_fly(fly, (6, 5, 2.0), Rotation3D("quat", (1, 0, 0, 0)))
        sim = flygym_tpu.Simulation(world)
        renderer = sim.set_renderer("aimcam", camera_res=(40, 52))
        frame = next(iter(renderer.render(sim.state).values()))
        # The fly must appear near the image center despite the offset spawn.
        gray = frame.astype(np.float32).mean(-1)
        sky = gray[0, :].mean()
        center = gray[14:26, 18:34]
        assert np.abs(center - sky).max() > 15, "fly not centered in view"

    def test_show_in_notebook_requires_frames(self, sim):
        sim.reset()
        renderer = sim.set_renderer("trackcam", camera_res=(24, 32))
        with pytest.raises(RuntimeError):
            renderer.show_in_notebook()

    def test_grid_montage(self, world, tmp_path):
        from flygym_tpu.utils.video import montage_grid

        frames = np.random.randint(0, 255, (3, 24, 32, 3), np.uint8)
        grid = montage_grid(frames, [0, 1, 2])
        assert grid.shape == (48, 64, 3)


class TestImageTextures:
    """Image-file texture support (the analog of MuJoCo GL file textures,
    reference ``rendering.py:16-268``): planar ground decal + equirect sky."""

    def test_ground_texture_colors_ground(self, sim):
        sim.reset()
        red = np.zeros((4, 4, 3), np.float32)
        red[..., 0] = 1.0
        renderer = sim.set_renderer(
            "trackcam", camera_res=(40, 56), ground_texture=red
        )
        frame = next(iter(renderer.render(sim.state).values())).astype(float)
        # Bottom rows look at the ground: red channel must dominate.
        bottom = frame[-8:].mean(axis=(0, 1))
        assert bottom[0] > 1.5 * bottom[1] and bottom[0] > 1.5 * bottom[2], bottom

    def test_sky_texture_colors_sky(self, sim):
        sim.reset()
        magenta = np.zeros((4, 8, 3), np.float32)
        magenta[..., 0] = 1.0
        magenta[..., 2] = 1.0
        renderer = sim.set_renderer(
            "trackcam", camera_res=(40, 56), sky_texture=magenta
        )
        frame = next(iter(renderer.render(sim.state).values())).astype(float)
        top = frame[:4].mean(axis=(0, 1))
        assert top[0] > 1.5 * top[1] and top[2] > 1.5 * top[1], top

    def test_load_texture_formats(self, tmp_path):
        from flygym_tpu.render.renderer import _load_texture

        assert _load_texture(None) is None
        u8 = np.full((2, 2, 3), 255, np.uint8)
        assert float(np.max(np.asarray(_load_texture(u8)))) == 1.0
        rgba = np.ones((2, 2, 4), np.float32)
        assert _load_texture(rgba).shape == (2, 2, 3)
        gray = np.ones((2, 2), np.float32)
        assert _load_texture(gray).shape == (2, 2, 3)
        with pytest.raises(ValueError):
            _load_texture(np.ones((2, 2, 2), np.float32))
        # Round-trip through an image file (matplotlib writer/reader).
        from matplotlib.image import imsave

        path = tmp_path / "tex.png"
        imsave(path, np.zeros((2, 2, 3), np.float32))
        tex = _load_texture(path)
        assert tex.shape == (2, 2, 3)

    def test_bilinear_wrap_sampling(self):
        import jax.numpy as jnp

        from flygym_tpu.render.raycast import _bilinear_wrap

        tex = jnp.asarray(
            [[[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]],
             [[0.0, 0.0, 1.0], [1.0, 1.0, 1.0]]]
        )
        # Texel centers sample exactly; ±1 wraps to the same texel.
        u = jnp.asarray([0.25, 0.75, 1.25, -0.75])
        v = jnp.asarray([0.25, 0.25, 0.25, 0.25])
        got = np.asarray(_bilinear_wrap(tex, u, v))
        np.testing.assert_allclose(got[0], [1, 0, 0], atol=1e-6)
        np.testing.assert_allclose(got[1], [0, 1, 0], atol=1e-6)
        # u = 1.25 and u = -0.75 both wrap to u = 0.25 (texel 0).
        np.testing.assert_allclose(got[2], got[0], atol=1e-6)
        np.testing.assert_allclose(got[3], got[0], atol=1e-6)


class TestPreview:
    def test_preview_model(self, world):
        from flygym_tpu.render import preview_model

        frame = preview_model(world, "trackcam", duration_s=0.002, camera_res=(24, 32))
        assert frame.shape == (24, 32, 3)

    def test_interactive_viewer_launches_mujoco(self, world, monkeypatch):
        """The viewer loads the exported MJCF into stock MuJoCo, resets the
        neutral keyframe, and hands off to mujoco.viewer.launch (reference
        ``rendering.py:271-297``). Launch is stubbed: no GL on CI."""
        mujoco = pytest.importorskip("mujoco")
        import mujoco.viewer

        called = {}

        def fake_launch(m, d):
            called["model"], called["data"] = m, d

        monkeypatch.setattr(mujoco.viewer, "launch", fake_launch)
        # Simulate a workstation: the headless guard (no DISPLAY → helpful
        # RuntimeError instead of a GLFW hang) must not fire here.
        monkeypatch.setenv("DISPLAY", ":0")
        from flygym_tpu.render import launch_interactive_viewer

        launch_interactive_viewer(world)
        assert called["model"].nq > 0
        # Neutral keyframe applied: root body spawned at z = 2 mm.
        assert np.isfinite(called["data"].qpos).all()
        key_id = mujoco.mj_name2id(
            called["model"], mujoco.mjtObj.mjOBJ_KEY, "neutral"
        )
        assert key_id >= 0
        np.testing.assert_allclose(
            called["data"].qpos, called["model"].key_qpos[key_id]
        )

    def test_interactive_viewer_headless_raises(self, world, monkeypatch):
        """Without a display the viewer must raise the guidance error, not
        hang inside GLFW."""
        import sys

        if not sys.platform.startswith("linux"):
            pytest.skip("headless guard is Linux-specific")
        monkeypatch.delenv("DISPLAY", raising=False)
        monkeypatch.delenv("WAYLAND_DISPLAY", raising=False)
        from flygym_tpu.render import launch_interactive_viewer

        with pytest.raises(RuntimeError, match="display"):
            launch_interactive_viewer(world)


class TestHeightfieldRaycast:
    """Terrain rendering: the raycaster must hit z = h(x, y), not a flat
    plane (reference renders terrain meshes through its GPU raytracer)."""

    @pytest.fixture(scope="class")
    def hfield_world(self):
        from flygym_tpu.compose import HeightfieldTerrainWorld

        heights = np.zeros((40, 40), np.float32)
        heights[:, 20:] = 1.5  # step up at x = 0
        fly = Fly(name=FLY)
        fly.add_joints(
            Skeleton(axis_order=AxisOrder.YPR, joint_preset=JointPreset.LEGS_ONLY),
            neutral_pose=KinematicPosePreset.NEUTRAL,
        )
        fly.add_tracking_camera()
        world = HeightfieldTerrainWorld(
            heights=heights, xy0=(-20.0, -20.0), cell=(1.0, 1.0)
        )
        world.add_fly(fly, (0, 0, 30.0), Rotation3D("quat", (1, 0, 0, 0)))
        return world

    def test_vertical_rays_hit_surface_height(self, hfield_world):
        import jax.numpy as jnp

        from flygym_tpu.engine.kinematics import geom_poses, kinematics_full
        from flygym_tpu.render.raycast import raycast_scene

        model, state = hfield_world.compile()
        gpos, gquat = geom_poses(model, state.xpos, state.xquat)
        origins = jnp.array(
            [[-10.0, -10.0, 20.0], [10.0, -10.0, 20.0]], jnp.float32
        )
        dirs = jnp.array([[0, 0, -1.0], [0, 0, -1.0]], jnp.float32)
        mask = jnp.zeros(model.ngeom)  # terrain only
        t, geom_idx, normal = raycast_scene(model, gpos, gquat, origins, dirs, mask)
        t = np.asarray(t)
        assert np.all(np.asarray(geom_idx) == -1)
        assert abs(t[0] - 20.0) < 1e-2  # low side: h = 0
        assert abs(t[1] - 18.5) < 1e-2  # raised side: h = 1.5
        assert np.allclose(np.asarray(normal), [0, 0, 1], atol=1e-3)

    def test_oblique_ray_hits_step_wall(self, hfield_world):
        import jax.numpy as jnp

        from flygym_tpu.engine.kinematics import geom_poses
        from flygym_tpu.render.raycast import raycast_scene

        model, state = hfield_world.compile()
        gpos, gquat = geom_poses(model, state.xpos, state.xquat)
        # Horizontal-ish ray skimming at z = 0.75 toward the raised half:
        # must stop near the step wall at x ~ 0, not pass to infinity.
        origins = jnp.array([[-5.0, -10.0, 0.75]], jnp.float32)
        dirs = jnp.array([[1.0, 0, 0]], jnp.float32)
        mask = jnp.zeros(model.ngeom)
        t, geom_idx, _ = raycast_scene(model, gpos, gquat, origins, dirs, mask)
        assert int(geom_idx[0]) == -1
        assert 4.0 < float(t[0]) < 6.5

    def test_render_blocks_terrain_frame(self):
        from flygym_tpu.compose import BlocksTerrainWorld

        fly = Fly(name=FLY)
        fly.add_joints(
            Skeleton(axis_order=AxisOrder.YPR, joint_preset=JointPreset.LEGS_ONLY),
            neutral_pose=KinematicPosePreset.NEUTRAL,
        )
        fly.add_tracking_camera()
        world = BlocksTerrainWorld(rng_seed=3)
        world.add_fly(fly, (0, 0, 2.0), Rotation3D("quat", (1, 0, 0, 0)))
        sim = flygym_tpu.Simulation(world)
        renderer = sim.set_renderer("trackcam", camera_res=(48, 64))
        frame = next(iter(renderer.render(sim.state).values()))
        assert frame.shape == (48, 64, 3)
        # Blocks terrain shades with varying normals: the ground region must
        # show more structure than a flat checkered plane would at this
        # scale (block edges produce dark/bright seams).
        ground = frame[30:, :].astype(np.float32)
        assert ground.std() > 5


class TestMeshFidelity:
    """SDF mesh refinement (render/sdf.py): the true anatomical surfaces
    replace the capsule proxies when mesh_fidelity=True (the analog of the
    reference's MuJoCo-GL mesh rendering, ``rendering.py:16-268``)."""

    @pytest.fixture(scope="class")
    def settled(self, world):
        sim = flygym_tpu.Simulation(world)
        sim.warmup()
        return sim

    def test_sdf_pack_covers_fly_geoms(self, world):
        from flygym_tpu.render.sdf import build_sdf_pack

        model, _ = world.compile()
        pack = build_sdf_pack(model, world.compiled.geom_name2id)
        if pack is None:
            pytest.skip("sdf_meshes.npz asset not present")
        base = np.asarray(pack["base"])
        # Every capsule/sphere fly geom has a baked SDF; the ground has none.
        fly_geoms = [
            g
            for g, t in enumerate(model.geom_types)
            if t in ("capsule", "sphere")
        ]
        assert all(base[g] >= 0 for g in fly_geoms)
        plane = [g for g, t in enumerate(model.geom_types) if t == "plane"]
        assert all(base[g] < 0 for g in plane)

    def test_mesh_render_differs_from_capsules(self, world, settled):
        from flygym_tpu.render.renderer import Renderer

        frames = {}
        for mesh in (False, True):
            r = Renderer(
                settled.model,
                world,
                "trackcam",
                camera_res=(60, 80),
                mesh_fidelity=mesh,
            )
            frames[mesh] = np.asarray(
                r._render_one_camera(0, settled.state)
            )
        for f in frames.values():
            assert f.shape == (60, 80, 3)
            assert np.isfinite(f).all()
            assert 0.15 < f.mean() < 0.85
        # The true mesh silhhouette differs from the capsule hulls on a
        # meaningful fraction of pixels (wings become thin membranes).
        diff = np.abs(frames[True] - frames[False]).max(axis=-1) > 0.05
        assert 0.01 < diff.mean() < 0.6, diff.mean()

    def test_batched_mesh_render(self, world):
        """vmapped multi-world rendering composes with the SDF refine."""
        from flygym_tpu.render.renderer import Renderer

        bsim = flygym_tpu.BatchSimulation(world, 4)
        r = Renderer(
            bsim.model,
            world,
            "trackcam",
            camera_res=(40, 52),
            world_ids=[0, 2],
            mesh_fidelity=True,
        )
        frames = r.render(bsim.state)
        arr = next(iter(frames.values()))
        assert np.asarray(arr).shape[-3:] == (40, 52, 3)
        assert np.isfinite(np.asarray(arr)).all()


class TestLights:
    """Multi-light shading (reference batch rendering adds per-fly overhead
    lights, ``warp/rendering.py:385-441``)."""

    def test_default_matches_explicit_sun(self, sim):
        from flygym_tpu.render.raycast import default_lights

        sim.reset()
        r_def = flygym_tpu.render.Renderer(
            sim.model, sim.world, "trackcam", camera_res=(40, 56)
        )
        r_sun = flygym_tpu.render.Renderer(
            sim.model, sim.world, "trackcam", camera_res=(40, 56),
            lights=[
                {
                    "kind": "directional",
                    "dir": np.asarray(default_lights()[0]["vec"]),
                    "color": 0.5,
                    "specular": 1.0,
                }
            ],
        )
        f_def = next(iter(r_def.render(sim.state).values()))
        f_sun = next(iter(r_sun.render(sim.state).values()))
        assert np.abs(f_def.astype(int) - f_sun.astype(int)).max() <= 1

    def test_colored_point_light_tints_scene(self, sim):
        sim.reset()
        red = flygym_tpu.render.Renderer(
            sim.model, sim.world, "trackcam", camera_res=(40, 56),
            lights=[
                {
                    "kind": "point",
                    "pos": (0.0, 0.0, 8.0),
                    "color": (1.2, 0.1, 0.1),
                    "cast_shadow": False,
                }
            ],
        )
        frame = next(iter(red.render(sim.state).values())).astype(float)
        ground = frame[30:, :, :]  # bottom rows: lit ground
        assert ground[..., 0].mean() > ground[..., 2].mean() + 10

    def test_target_tracking_overhead_light(self, sim):
        sim.reset()
        root = f"{FLY}/c_thorax"
        r = flygym_tpu.render.Renderer(
            sim.model, sim.world, "trackcam", camera_res=(40, 56),
            lights=[
                {
                    "kind": "point",
                    "target": root,
                    "offset": (0.0, 0.0, 10.0),
                    "color": 0.8,
                },
                {"kind": "directional", "dir": (0.2, 0.1, -0.97),
                 "color": 0.3, "cast_shadow": False},
            ],
        )
        frame = next(iter(r.render(sim.state).values()))
        assert frame.shape == (40, 56, 3)
        assert np.isfinite(frame.astype(float)).all()
        assert frame.std() > 5

    def test_bad_light_specs_raise(self, sim):
        with pytest.raises(ValueError):
            flygym_tpu.render.Renderer(
                sim.model, sim.world, "trackcam",
                lights=[{"kind": "spot", "dir": (0, 0, -1)}],
            )
        with pytest.raises(ValueError):
            flygym_tpu.render.Renderer(
                sim.model, sim.world, "trackcam",
                lights=[{"kind": "directional", "target": f"{FLY}/c_thorax"}],
            )
        with pytest.raises(ValueError):
            flygym_tpu.render.Renderer(
                sim.model, sim.world, "trackcam",
                lights=[{"kind": "point", "color": 1.0}],
            )

    def test_batched_render_with_tracking_light(self, world):
        """A target-tracking point light resolves per world under the
        vmapped batch render (each world's light follows its own fly)."""
        import jax
        import jax.numpy as jnp

        model, state0 = world.compile()
        bstate = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (2,) + x.shape), state0
        )
        # Move world 1's fly far away so the two worlds differ.
        _b, qadr, _v = model.free_joints[0]
        qpos = bstate.qpos.at[1, qadr].add(5.0)
        import dataclasses

        bstate = dataclasses.replace(bstate, qpos=qpos)
        import flygym_tpu

        r = flygym_tpu.render.Renderer(
            model, world, "trackcam", camera_res=(32, 44),
            world_ids=[0, 1],
            lights=[{"kind": "point", "target": f"{FLY}/c_thorax",
                     "offset": (0, 0, 8.0), "color": 0.9}],
        )
        frames = next(iter(r.render(bstate).values()))
        assert frames.shape == (2, 32, 44, 3)
        assert np.isfinite(frames.astype(float)).all()


class TestMaterialTable:
    """Per-geom material/texture table (visuals.json → Fly.colorize →
    model.geom_matprops / geom_tex → render_pixels), the analog of the
    reference's MuJoCo material pipeline (flygym ``fly.py:443-469``)."""

    def test_colorize_populates_material_table(self, world):
        model, _ = world.compile()
        mat = np.asarray(model.geom_matprops)
        tex = np.asarray(model.geom_tex)
        c = world.compiled
        gix = c.geom_name2id

        def g(name_sub):
            matches = [i for n, i in gix.items() if name_sub in n]
            assert matches, name_sub
            return matches[0]

        # visuals.json: every fly material has specular/shininess 0.2.
        # (tibia carries the flat "tibia" texture with mark prob 0.05.)
        femur = g("lf_tibia")
        assert np.allclose(mat[femur], [0.2, 0.2])
        # Abdomen segments carry a gradient texture; femur a flat one with
        # mark probability 0.05; the eye is untextured.
        abdomen = g("abdomen3")
        assert tex[abdomen, 0] == 2.0  # gradient
        assert not np.allclose(tex[abdomen, 1:4], tex[abdomen, 4:7])
        assert tex[femur, 0] == 1.0  # flat
        assert tex[femur, 10] == pytest.approx(0.05)
        eye = g("_eye")
        assert tex[eye, 0] == 0.0

    def test_gradient_texture_varies_along_geom(self, sim):
        """The abdomen gradient must produce visibly non-uniform cuticle:
        render and check fly-pixel color variance exceeds what a flat
        color + shading alone produces on the same frame."""
        sim.reset()
        renderer = sim.set_renderer("trackcam", camera_res=(80, 100))
        frame = next(iter(renderer.render(sim.state).values())).astype(float)
        # Scene renders fine with the material stage active.
        assert np.isfinite(frame).all() and frame.std() > 10
