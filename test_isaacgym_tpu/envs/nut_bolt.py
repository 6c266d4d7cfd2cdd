"""Nut-on-bolt threading via SDF collision (SURVEY.md N9).

Counterpart of /root/reference/examples/franka_nut_bolt_ik_osc.py's physics
core: the reference screws an M4 nut down a bolt using PhysX SDF contact
("CPU sim not supported by SDF" :215, 32 position iterations :231, the
`<sdf resolution>` hints in assets/urdf/nut_bolt/*.urdf). Here the nut is
the reference's real nut_m4_tight OBJ (5x scale, like the example's *_5x
assets :265-281); the bolt mesh+SDF are generated from the thread
parameters measured off that nut, because the reference's bolt OBJ is a
stripped large blob (.MISSING_LARGE_BLOBS).

The env spins the nut about the bolt axis and the SDF thread contact turns
rotation into descent at pitch/(2*pi) per radian — the same conversion the
reference's ScrewFSM encodes explicitly (:41-203).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..assets import create_mesh_asset, load_urdf
from ..assets.sdf import BoltSpec, bolt_mesh, bolt_sdf_fn, sdf_from_fn
from ..core.config import PlaneParams, SimParams
from ..core.scene import SceneBuilder
from ..core.sim import Simulator
from ..core.state import SimState


@dataclasses.dataclass
class NutBoltEnv:
    num_envs: int = 4
    scale: float = 5.0  # the reference example uses the *_5x assets
    # driven nut spin about z (rad/s). Right-hand thread: u = z - p*theta/2pi,
    # so NEGATIVE spin (clockwise from above) screws the nut DOWN — the same
    # sign the reference FSM drives (franka_nut_bolt_ik_osc.py rotation phase).
    spin: float = -2.0 * np.pi
    env_spacing: float = 0.2  # 0 co-locates envs (bitwise-determinism tests)
    asset_root: str = "/root/reference/assets"

    def __post_init__(self):
        s = self.scale
        spec = BoltSpec(scale=s)
        l, hh, hr = spec.length * s, spec.head_h * s, spec.head_r * s
        half_z = (l + hh) * 0.5
        bolt_grid = sdf_from_fn(
            bolt_sdf_fn(spec), (-hr, -hr, -half_z), (hr, hr, half_z)
        )
        bv, bf = bolt_mesh(spec)
        bolt = create_mesh_asset(
            "bolt", bv, bf, density=7800.0, sdf=bolt_grid, fix_base_link=True
        )
        nut = load_urdf(
            self.asset_root,
            "urdf/nut_bolt/nut_m4_tight_SI_5x.urdf",
            density=7800.0,
        )

        sp = SimParams(dt=1 / 120, substeps=2, gravity=(0.0, 0.0, -9.8))
        sp.physx.num_position_iterations = 32  # reference :231
        sp.physx.contact_offset = 0.001 * s / 5.0
        sp.physx.rest_offset = 0.0
        sp.physx.contact_slop = 1e-4 * s / 5.0  # thread tolerance << 1.5mm
        # kinematic spin + 256 FPS probes capture the thread manifold from
        # the nut side alone; the analytic bolt field then runs gather-free
        # (r5 profile: the reverse voxel direction was 8x 6.5 ms corner
        # gathers per substep = 93% of the step). Descent-rate tests pin
        # the physics (tests/test_nut_bolt.py).
        sp.physx.sdf_bidirectional = False

        pitch = spec.pitch * s
        self.pitch = pitch
        # Start height: threads must MATE (the nut's internal thread phase
        # lines up with the bolt's external one) and the nut must clear the
        # bolt head below. The phase depends on where the nut OBJ's thread
        # sits in its AABB-centered frame, so compute it: scan one pitch of
        # candidate heights around mid-shank and keep the one with maximum
        # probe clearance (exact analytic bolt SDF, numpy, build-time only).
        probes = next(
            g.sdf_samples
            for l in nut.links
            for g in l.geoms
            if getattr(g, "sdf_samples", None) is not None
        )
        fn = bolt_sdf_fn(spec)
        nut_half = float(probes[:, 2].max())
        target = hh + nut_half + 2.5 * pitch  # clears the head by ~2 pitches
        zs = np.arange(target - pitch / 2, target + pitch / 2, pitch / 64)
        clear = np.array(
            [fn(probes + np.array([0.0, 0.0, z - half_z], np.float32)).min()
             for z in zs]
        )
        nut_z = float(zs[int(np.argmax(clear))])
        if clear.max() < 0:
            raise RuntimeError(
                f"nut/bolt threads never mate (best clearance {clear.max():.2e})"
            )

        b = SceneBuilder(sp)
        b.add_ground(PlaneParams())
        d = self.env_spacing
        for e in range(self.num_envs):
            b.create_env((-d, -d, 0), (d, d, 0.4), self.num_envs)
            b.create_actor(e, bolt, pos=(0, 0, half_z), name="bolt", group=e, filter=0)
            b.create_actor(e, nut, pos=(0, 0, nut_z), name="nut", group=e, filter=0)
        self.sim = Simulator(*b.finalize())
        self.nut_slot = self.sim.scene.find_actor("nut").slot

        # The nut is rotation-servoed (the reference turns it with the
        # gripper/FSM; here the "wrench" is ideal): give it effectively
        # infinite rotational inertia so contact impulses move it only
        # translationally — the solver can't fight the driven spin, and the
        # thread contact cleanly converts the forced rotation into descent.
        nut_body = self.sim.scene.find_actor("nut").body_start
        I = np.array(self.sim.params.body_inertia)
        I[:, nut_body] = np.eye(3) * 1e3
        self.sim.params = self.sim.params._replace(body_inertia=jnp.asarray(I))
        self.sim.state = self.sim.state._replace(
            root_angvel=self.sim.state.root_angvel.at[:, self.nut_slot].set(
                jnp.array([0.0, 0.0, self.spin], jnp.float32)
            )
        )
        self.sim.initial_state = self.sim.state

    # ------------------------------------------------------------------
    def rollout_fn(self, num_steps: int):
        """Jittable (state) -> state: spin the nut at self.spin about +z
        (kinematic drive, like the reference FSM's rotation phase) and let
        SDF thread contact convert spin into descent."""
        stepper = self.sim.stepper
        actions = self.sim.actions
        params = self.sim.params
        slot = self.nut_slot
        w = jnp.array([0.0, 0.0, self.spin], jnp.float32)

        def run(state: SimState) -> SimState:
            def body(carry, _):
                carry = carry._replace(
                    root_angvel=carry.root_angvel.at[:, slot].set(w)
                )
                return stepper.step(carry, actions, params), None

            out, _ = jax.lax.scan(body, state, None, length=num_steps)
            return out

        return run

    def nut_height(self, state: SimState):
        return state.root_pos[:, self.nut_slot, 2]
