"""Debug harness: minimal bodies vs MuJoCo golden trajectories."""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import mujoco as mj

from flygym_tpu.compose.spec import (
    BodySpec,
    GeomSpec,
    JointSpec,
    ModelSpec,
    PairSpec,
)
from flygym_tpu.engine.model import make_initial_state
from flygym_tpu.engine.step import step


def make_ball_spec(z0=2.0, mass=1e-3, radius=0.5):
    spec = ModelSpec("ball_world")
    spec.world_geoms.append(
        GeomSpec(name="ground", type="plane", size=(100.0, 100.0, 1.0))
    )
    body = BodySpec(name="ball", parent=None, pos=(0, 0, 0))
    body.add_joint(JointSpec(name="ballfree", type="free"))
    body.add_geom(
        GeomSpec(
            name="ballgeom",
            type="capsule",
            size=(radius, 0.3),
            mass=mass,
        )
    )
    spec.add_body(body)
    spec.pairs.append(
        PairSpec(
            geom1="ballgeom",
            geom2="ground",
            friction=(1.0, 1.0, 0.02, 1e-4, 1e-4),
            solref=(2e-4, 1.0),
            solimp=(0.98, 0.99, 1e-5, 0.5, 3.0),
            margin=1e-3,
        )
    )
    spec.neutral_joint_qpos["ballfree"] = [0, 0, z0, 1, 0, 0, 0]
    return spec


def run_mine(spec, n_steps):
    compiled = spec.compile()
    model = compiled.model
    state = make_initial_state(model)
    jstep = jax.jit(step)
    zs = []
    for _ in range(n_steps):
        state = jstep(model, state)
        zs.append(float(state.qpos[2]))
    return np.array(zs), state


def run_mujoco(spec, n_steps):
    xml = spec.to_mjcf_xml()
    m = mj.MjModel.from_xml_string(xml)
    d = mj.MjData(m)
    mj.mj_resetDataKeyframe(m, d, 0)
    zs = []
    for _ in range(n_steps):
        mj.mj_step(m, d)
        zs.append(float(d.qpos[2]))
    return np.array(zs), d


if __name__ == "__main__":
    spec = make_ball_spec()
    n = 2000
    z_mj, d = run_mujoco(make_ball_spec(), n)
    z_me, s = run_mine(spec, n)
    for i in [0, 100, 500, 1000, 1500, 1999]:
        print(f"step {i:5d}  mujoco z={z_mj[i]: .5f}   mine z={z_me[i]: .5f}")
    print("final qvel (mine):", np.asarray(s.qvel))
    print("final qvel (mj):  ", d.qvel)
