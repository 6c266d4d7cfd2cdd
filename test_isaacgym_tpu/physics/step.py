"""The jitted simulation step.

Replaces the reference hot loop `simulate + fetch_results + refresh_*`
(SURVEY.md §3.2-3.3): one pure function
    step(state, actions, params) -> state
containing all substeps, drives, dynamics, contacts and the body-state
refresh. Under jit the whole thing is one XLA program; under `lax.scan` many
steps amortize launch overhead to zero (see rollout()).

Gather/scatter between the canonical state layout (N, A/B/D, .) and per-group
batched layouts uses trace-time-constant index arrays, so XLA fuses them.
"""
from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.scene import Scene
from ..core.state import Actions, PhysParams, SimState
from ..math.quat import (
    orientation_error,
    quat_integrate,
    quat_mul,
    quat_rotate,
    quat_to_matrix,
)
from ..math.spatial import skew
from ..utils.linalg import spd_inv, spd_solve
from . import contacts as contacts_mod
from . import dynamics
from .kinematics import ArtTopo, body_jacobian, fk, jacobian as link_jacobian, topo_from_group

DOF_MODE_NONE, DOF_MODE_POS, DOF_MODE_VEL, DOF_MODE_EFFORT = 0, 1, 2, 3


class _GroupIndex(NamedTuple):
    """Static index arrays tying one ArtGroup into the canonical layout."""

    topo: ArtTopo
    slots: np.ndarray  # (K,) actor slots
    dof_idx: np.ndarray  # (K, Dg) into env dof axis
    body_idx: np.ndarray  # (K, L_real) into env body axis
    real_links: np.ndarray  # (L_real,) sim-link indices that are real bodies
    link_body_idx: np.ndarray  # (K, Ls) env body index per sim link (0 where synthetic)
    link_is_real: np.ndarray  # (Ls,) bool


class Stepper:
    def __init__(self, scene: Scene):
        self.scene = scene
        self.groups: List[_GroupIndex] = []
        for g in scene.art_groups:
            topo = topo_from_group(g)
            K = len(g.slots)
            Dg = g.num_dofs
            dof_idx = g.dof_start[:, None] + np.arange(Dg)[None, :]
            real_links = np.array([i for i, b in enumerate(g.body_of_link) if b >= 0])
            body_idx = g.body_start[:, None] + g.body_of_link[None, real_links]
            link_body = np.where(
                g.body_of_link >= 0, g.body_of_link, 0
            )
            link_body_idx = g.body_start[:, None] + link_body[None, :]
            self.groups.append(
                _GroupIndex(
                    topo=topo,
                    slots=np.asarray(g.slots),
                    dof_idx=dof_idx.astype(np.int32),
                    body_idx=body_idx.astype(np.int32),
                    real_links=real_links.astype(np.int32),
                    link_body_idx=link_body_idx.astype(np.int32),
                    link_is_real=np.asarray(g.body_of_link >= 0),
                )
            )
        self.free = scene.free_group
        self.static = scene.static_group
        # attractors resolved to (group, copy, sim link) — fixed-base
        # articulations only (the reference's usage: franka/kuka arms,
        # /root/reference/examples/franka_attractor.py, kuka_bin.py:181-273)
        self.attractors_by_group = [[] for _ in self.groups]
        for t, a in enumerate(scene.attractors):
            placed = False
            for g_i, gi in enumerate(self.groups):
                hits = np.argwhere(gi.body_idx == a.body)
                if len(hits):
                    copy, real_i = hits[0]
                    link = int(gi.real_links[real_i])
                    if not gi.topo.fixed_base:
                        raise NotImplementedError(
                            "attractors on floating-base articulations"
                        )
                    mask6 = np.array(
                        [
                            bool(a.axes & 1),
                            bool(a.axes & 2),
                            bool(a.axes & 4),
                            bool(a.axes & 8),
                            bool(a.axes & 16),
                            bool(a.axes & 32),
                        ],
                        np.float32,
                    )
                    self.attractors_by_group[g_i].append(
                        (
                            t,
                            int(copy),
                            link,
                            np.asarray(a.offset_pos, np.float32),
                            np.asarray(a.offset_quat, np.float32),
                            mask6,
                        )
                    )
                    placed = True
                    break
            if not placed:
                raise NotImplementedError(
                    "attractors are only supported on articulated bodies"
                )
        self.contact = contacts_mod.ContactSolver(scene)
        if scene.soft is not None:
            from .soft import SoftStepper

            self.soft = SoftStepper(scene.soft, scene)
        else:
            self.soft = None
        sp = scene.sim_params
        self.dt = sp.dt
        self.substeps = max(1, sp.substeps)
        self.h = sp.dt / self.substeps
        px = sp.physx
        self.solver_iters = max(px.num_position_iterations, 4)
        from ..utils import debug as _debug

        self.debug = _debug.enabled()  # TIG_DEBUG=1 (SURVEY §5.2)

    # ------------------------------------------------------------------
    def step(self, state: SimState, actions: Actions, params: PhysParams) -> SimState:
        # body state is fresh at step entry (refresh_body_state runs at the
        # end of every step and after every state write), so the first
        # substep reuses it instead of re-running FK — with the final
        # refresh, 2 link sweeps per step instead of substeps+1.
        first = True
        # CROSS-STEP warm starting: persistent per-row contact impulses ride
        # in SimState (keyed by static contact row), so force chains (heavy
        # stacks, pinch grasps) keep converging across steps instead of
        # being rebuilt from zero; separated rows are masked to zero by the
        # solver's `active` gate on re-entry (decay-on-separation).
        warm = (
            (state.warm_n, state.warm_t) if state.warm_n is not None else None
        )
        for sub_i in range(self.substeps):
            state, warm = self._substep(
                state, actions, params, reuse_body_state=first, warm=warm
            )
            if self.debug:
                from ..utils.debug import check_finite

                check_finite(state, f"substep {sub_i}")
            if self.soft is not None:
                # one-way coupled FEM solve (physics/soft.py): soft verts see
                # this substep's rigid poses (body cache refreshes at step
                # end — the press arm lags one substep, invisible at 1/60)
                sp, sv = self.soft.substep(
                    state.soft_pos, state.soft_vel,
                    state.body_pos, state.body_quat,
                    params, self.h, params.gravity,
                )
                state = state._replace(soft_pos=sp, soft_vel=sv)
            first = False
        state = self.refresh_body_state(state, params)
        if warm is not None and state.warm_n is not None:
            state = state._replace(warm_n=warm[0], warm_t=warm[1])
        return state._replace(
            time=state.time + self.dt, steps=state.steps + 1
        )

    def _link_state_from_bodies(self, gi: _GroupIndex, state: SimState):
        """Gather per-sim-link world state from the body cache (valid only
        when every sim link is a real body — no spherical-joint expansion)."""
        idx = jnp.asarray(gi.link_body_idx)  # (K, Ls)
        return (
            state.body_pos[:, idx],
            state.body_quat[:, idx],
            state.body_linvel[:, idx],
            state.body_angvel[:, idx],
        )

    # ------------------------------------------------------------------
    def _substep(
        self,
        state: SimState,
        actions: Actions,
        params: PhysParams,
        reuse_body_state: bool = False,
        warm=None,
    ):
        h = self.h
        warm_out = warm
        g_vec = params.gravity

        new_root_pos = state.root_pos
        new_root_quat = state.root_quat
        new_root_linvel = state.root_linvel
        new_root_angvel = state.root_angvel
        new_dof_pos = state.dof_pos
        new_dof_vel = state.dof_vel

        # ---------- phase A: articulated groups — velocities (pre-contact) ----------
        group_data = []
        for g_i, gi in enumerate(self.groups):
            topo = gi.topo
            K = len(gi.slots)
            Dg = gi.dof_idx.shape[1]
            base = 0 if topo.fixed_base else 6
            nv = base + Dg

            slots = jnp.asarray(gi.slots)
            didx = jnp.asarray(gi.dof_idx)
            root_pos = state.root_pos[:, slots]  # (N, K, 3)
            root_quat = state.root_quat[:, slots]
            root_lin = state.root_linvel[:, slots]
            root_ang = state.root_angvel[:, slots]
            q = state.dof_pos[:, didx]  # (N, K, Dg)
            qd = state.dof_vel[:, didx]

            if reuse_body_state and bool(gi.link_is_real.all()):
                pos, quat, lin, ang = self._link_state_from_bodies(gi, state)
            else:
                pos, quat, lin, ang = fk(
                    topo, root_pos, root_quat, root_lin, root_ang, q, qd
                )

            # --- drives ---
            mode = params.dof_drive_mode[:, didx]
            kp = params.dof_stiffness[:, didx]
            kd = params.dof_damping[:, didx]
            q_t = actions.dof_pos_target[:, didx]
            v_t_raw = actions.dof_vel_target[:, didx]
            eff = actions.dof_effort[:, didx]
            max_eff = params.dof_max_effort[:, didx]

            kp_eff = jnp.where(mode == DOF_MODE_POS, kp, 0.0)
            v_t = jnp.where(mode == DOF_MODE_VEL, v_t_raw, 0.0)
            tau_raw = kp_eff * (q_t - q) + kd * (v_t - qd) - h * kp_eff * qd
            tau_drive = jnp.clip(tau_raw, -max_eff, max_eff)
            # implicit drive damping is only valid while the drive is linear;
            # in saturation the drive is a constant torque (PhysX-like force
            # limit), so the matrix term must vanish or it over-damps.
            sat_scale = jnp.clip(max_eff / jnp.abs(tau_raw).clip(1e-9), 0.0, 1.0)
            tau_eff = jnp.where(
                mode == DOF_MODE_EFFORT, jnp.clip(eff, -max_eff, max_eff), 0.0
            )
            tau_j = tau_drive + tau_eff
            d_eff_j = sat_scale * (kd + h * kp_eff)
            armature = params.dof_armature[:, didx]

            if base:
                zpad = jnp.zeros(tau_j.shape[:-1] + (6,), tau_j.dtype)
                tau = jnp.concatenate([zpad, tau_j], axis=-1)
                d_eff = jnp.concatenate([zpad, d_eff_j], axis=-1)
                diag_add = jnp.concatenate([zpad, armature], axis=-1)
            else:
                tau, d_eff, diag_add = tau_j, d_eff_j, armature

            # --- external forces on links (ENV_SPACE world axes) ---
            lbidx = jnp.asarray(gi.link_body_idx)  # (K, Ls)
            is_real = jnp.asarray(gi.link_is_real, bool)[None, None, :, None]
            bforce = jnp.where(is_real, actions.body_force[:, lbidx], 0.0)
            btorque = jnp.where(is_real, actions.body_torque[:, lbidx], 0.0)
            origin = pos[..., 0:1, :]
            arm = pos - origin
            f_ext = jnp.concatenate(
                [btorque + jnp.cross(arm, bforce), bforce], axis=-1
            )  # (N, K, Ls, 6) about root origin

            # runtime masses/inertia (randomizable): gather real-link params
            mass_l = jnp.where(
                jnp.asarray(gi.link_is_real),
                params.body_mass[:, lbidx],
                topo.mass,
            )
            com_l = jnp.where(
                jnp.asarray(gi.link_is_real)[..., None],
                params.body_com[:, lbidx],
                topo.com,
            )
            inert_l = jnp.where(
                jnp.asarray(gi.link_is_real)[..., None, None],
                params.body_inertia[:, lbidx],
                topo.inertia,
            )
            # gravity disable per body
            no_grav = jnp.where(
                jnp.asarray(gi.link_is_real),
                params.body_disable_gravity[:, lbidx],
                False,
            )
            # counteract gravity on disabled links via f_ext
            anti_g = mass_l[..., None] * g_vec * no_grav[..., None]
            com_world = pos + quat_rotate(quat, com_l)
            arm_c = com_world - origin
            f_ext = f_ext + jnp.concatenate(
                [jnp.cross(arm_c, -anti_g), -anti_g], axis=-1
            )

            # armature adds to the mass-matrix diagonal: A = M + h*d_eff + armature
            qdd, M_full, A_op = dynamics.forward_dynamics(
                topo, pos, quat, lin, ang, qd, tau, h,
                d_eff=d_eff + diag_add / h,
                gravity=g_vec,
                mass=mass_l, com=com_l, inertia=inert_l,
                f_ext=f_ext,
                return_op=True,
            )

            # --- integrate joints (semi-implicit) ---
            qd_new = qd + h * qdd[..., base:]
            maxv = params.dof_max_velocity[:, didx]
            qd_new = jnp.clip(qd_new, -maxv, maxv)

            # joint Coulomb friction (DOF property `friction`,
            # /root/reference/examples/joint_monkey.py:121-126): a friction
            # torque F can change joint velocity by at most F*h/M_jj in one
            # substep; removing min(|qd|, that) is the unconditionally stable
            # velocity-level form (never reverses sign)
            fric = params.dof_friction[:, didx]
            m_jj = jnp.diagonal(M_full, axis1=-2, axis2=-1)[..., base:]
            dv_max = fric * h / jnp.clip(m_jj, 1e-9)
            qd_new = qd_new - jnp.clip(qd_new, -dv_max, dv_max)

            # --- attractors: implicit 6-DOF spring-damper impulses ---
            # Soft-constraint velocity solve (stable at the reference's
            # stiffness=5e5 — franka_attractor.py:151): per attractor,
            #   (J M^-1 J^T + I/(h(hk+c))) lam = k*err/(hk+c) - v6
            # applied as joint-velocity impulse dqd = M^-1 J^T lam.
            for (t, copy, link, off_p, off_q, mask6) in self.attractors_by_group[g_i]:
                M = dynamics.mass_matrix(
                    topo, pos[:, copy], quat[:, copy],
                    mass=mass_l[:, copy], com=com_l[:, copy],
                    inertia=inert_l[:, copy],
                )  # (N, nv, nv) — fixed base: nv == Dg
                J = body_jacobian(topo, pos[:, copy], quat[:, copy], link)
                p_l = pos[:, copy, link]
                q_l = quat[:, copy, link]
                p_att = p_l + quat_rotate(q_l, jnp.asarray(off_p))
                q_att = quat_mul(q_l, jnp.asarray(off_q))
                r = p_att - p_l
                J_p = J[:, :3] - skew(r) @ J[:, 3:]
                Jt = jnp.concatenate([J_p, J[:, 3:]], axis=-2)  # (N, 6, nv)
                m6 = jnp.asarray(mask6)
                Jm = m6[None, :, None] * Jt
                k_a = params.attractor_stiffness[:, t]
                c_a = params.attractor_damping[:, t]
                en = actions.attractor_enabled[:, t] & ((k_a + c_a) > 0)
                denom = jnp.clip(h * k_a + c_a, 1e-9)
                gamma = 1.0 / (h * denom)
                err_p = actions.attractor_target_pos[:, t] - p_att
                err_r = orientation_error(
                    actions.attractor_target_quat[:, t], q_att
                )
                err6 = jnp.concatenate([err_p, err_r], axis=-1) * m6
                v6 = jnp.einsum("nij,nj->ni", Jt, qd_new[:, copy]) * m6
                X = spd_solve(M, jnp.swapaxes(Jm, -1, -2))  # (N, nv, 6)
                W = Jm @ X
                A = W + (gamma[:, None] + (1.0 - m6) * 1.0)[..., None] * jnp.eye(
                    6, dtype=W.dtype
                )
                rhs = (k_a / denom)[:, None] * err6 - v6
                lam = spd_solve(A, rhs) * m6
                # force limit (AttractorProperties.forceLimit)
                flim = params.attractor_force_limit[:, t]
                lnorm = jnp.linalg.norm(lam[:, :3], axis=-1).clip(1e-9)
                scale = jnp.minimum(1.0, flim * h / lnorm)
                lam = lam * jnp.where(jnp.isfinite(flim), scale, 1.0)[:, None]
                lam = jnp.where(en[:, None], lam, 0.0)
                dqd = jnp.einsum("nij,nj->ni", X, lam)
                qd_new = qd_new.at[:, copy].add(dqd)

            # assemble the generalized velocity vector matching the jacobian
            # column layout ([lin(3), ang(3), joints] for floating base)
            if topo.fixed_base:
                qd_full = qd_new
            else:
                v_new = root_lin + h * qdd[..., 0:3]
                w_new = root_ang + h * qdd[..., 3:6]
                qd_full = jnp.concatenate([v_new, w_new, qd_new], axis=-1)
            group_data.append(
                dict(
                    pos=pos, quat=quat, qd_full=qd_full, A_op=A_op,
                    q=q, didx=didx, slots=slots,
                    root_pos=root_pos, root_quat=root_quat, base=base,
                )
            )

        # ---------- phase B: free bodies — velocities (pre-contact) ----------
        free_data = None
        if self.free is not None and self.free.count:
            fslots = jnp.asarray(self.free.slots)
            fbody = jnp.asarray(self.free.body_slot)
            p0 = state.root_pos[:, fslots]
            q0 = state.root_quat[:, fslots]
            v0 = state.root_linvel[:, fslots]
            w0 = state.root_angvel[:, fslots]
            m = params.body_mass[:, fbody]  # (N, F)
            com = params.body_com[:, fbody]
            I_l = params.body_inertia[:, fbody]
            no_grav = params.body_disable_gravity[:, fbody]

            F = actions.body_force[:, fbody]
            T = actions.body_torque[:, fbody]
            R = quat_to_matrix(q0)
            com_w = p0 + quat_rotate(q0, com)
            # force-at-pos: extra torque about com
            T = T + jnp.where(
                actions.use_force_pos,
                jnp.cross(actions.body_force_pos[:, fbody] - com_w, F),
                0.0,
            )
            g_eff = jnp.where(no_grav[..., None], 0.0, g_vec)
            acc = F / m[..., None] + g_eff
            I_w = jnp.einsum("...ij,...jk,...lk->...il", R, I_l, R)
            gyro = jnp.cross(w0, jnp.einsum("...ij,...j->...i", I_w, w0))
            wdot = spd_solve(I_w, T - gyro)

            ld = jnp.asarray(self.free.linear_damping, jnp.float32)
            ad = jnp.asarray(self.free.angular_damping, jnp.float32)
            v1 = (v0 + h * acc) * jnp.maximum(0.0, 1.0 - h * ld)[..., None]
            w1 = (w0 + h * wdot) * jnp.maximum(0.0, 1.0 - h * ad)[..., None]
            mlv = jnp.asarray(self.free.max_linear_velocity, jnp.float32)
            mav = jnp.asarray(self.free.max_angular_velocity, jnp.float32)
            v1 = jnp.clip(v1, -mlv[..., None], mlv[..., None])
            w1 = jnp.clip(w1, -mav[..., None], mav[..., None])
            free_data = dict(
                p0=p0, q0=q0, v=v1, w=w1, m=m, I_w=I_w, com_w=com_w, com=com,
                fslots=fslots, fbody=fbody,
            )

        # ---------- phase C: unified contact solve (free bodies + links) ----------
        if self.contact.enabled:
            # CURRENT body poses: articulation links at this substep's FK,
            # free roots at this substep's entry, statics from the cache
            cur_bp, cur_bq = state.body_pos, state.body_quat
            for gi, gd in zip(self.groups, group_data):
                bidx = jnp.asarray(gi.body_idx)
                rl = jnp.asarray(gi.real_links)
                cur_bp = cur_bp.at[:, bidx].set(gd["pos"][..., rl, :])
                cur_bq = cur_bq.at[:, bidx].set(gd["quat"][..., rl, :])
            if free_data is not None:
                cur_bp = cur_bp.at[:, free_data["fbody"]].set(free_data["p0"])
                cur_bq = cur_bq.at[:, free_data["fbody"]].set(free_data["q0"])

            art_jac, art_Ainv = [], []
            for g_i, (gi, gd) in enumerate(zip(self.groups, group_data)):
                ia, ib = self.contact.link_lists[g_i]
                if len(ia) + len(ib):
                    art_jac.append(link_jacobian(gi.topo, gd["pos"], gd["quat"]))
                    art_Ainv.append(spd_inv(gd["A_op"]))
                else:
                    art_jac.append(None)
                    art_Ainv.append(None)

            qd_fulls = [gd["qd_full"] for gd in group_data]
            fv = free_data["v"] if free_data else None
            fw = free_data["w"] if free_data else None
            fv, fw, qd_fulls, cf_body, warm_out = self.contact.solve(
                cur_bp,
                cur_bq,
                (state.body_linvel, state.body_angvel),
                fv,
                fw,
                free_data["m"] if free_data else None,
                free_data["I_w"] if free_data else None,
                free_data["com_w"] if free_data else None,
                qd_fulls,
                art_jac,
                art_Ainv,
                params,
                h,
                warm=warm,
            )
            state = state._replace(contact_force=cf_body)
            for gd, qd_full in zip(group_data, qd_fulls):
                gd["qd_full"] = qd_full
            if free_data is not None:
                free_data["v"] = fv
                free_data["w"] = fw

        # ---------- phase D: limits + position integration ----------
        for gi, gd in zip(self.groups, group_data):
            topo = gi.topo
            base = gd["base"]
            didx = gd["didx"]
            slots = gd["slots"]
            qd_new = gd["qd_full"][..., base:]
            q_new = gd["q"] + h * qd_new
            lo = params.dof_lower[:, didx]
            hi = params.dof_upper[:, didx]
            has_lim = params.dof_has_limits[:, didx]
            q_clamped = jnp.clip(q_new, lo, hi)
            hit_lo = has_lim & (q_new < lo)
            hit_hi = has_lim & (q_new > hi)
            q_new = jnp.where(has_lim, q_clamped, q_new)
            qd_new = jnp.where(hit_lo, jnp.maximum(qd_new, 0.0), qd_new)
            qd_new = jnp.where(hit_hi, jnp.minimum(qd_new, 0.0), qd_new)
            new_dof_vel = new_dof_vel.at[:, didx].set(qd_new)
            new_dof_pos = new_dof_pos.at[:, didx].set(q_new)
            if not topo.fixed_base:
                v_new = gd["qd_full"][..., 0:3]
                w_new = gd["qd_full"][..., 3:6]
                new_root_linvel = new_root_linvel.at[:, slots].set(v_new)
                new_root_angvel = new_root_angvel.at[:, slots].set(w_new)
                new_root_pos = new_root_pos.at[:, slots].set(
                    gd["root_pos"] + h * v_new
                )
                new_root_quat = new_root_quat.at[:, slots].set(
                    quat_integrate(gd["root_quat"], w_new, h)
                )

        if free_data is not None:
            fd = free_data
            v1, w1 = fd["v"], fd["w"]
            # integrate about com to respect com offsets
            com_w1 = fd["com_w"] + h * v_com(v1, w1, fd["com_w"], fd["p0"])
            q1 = quat_integrate(fd["q0"], w1, h)
            p1 = com_w1 - quat_rotate(q1, fd["com"])
            fslots = fd["fslots"]
            new_root_pos = new_root_pos.at[:, fslots].set(p1)
            new_root_quat = new_root_quat.at[:, fslots].set(q1)
            new_root_linvel = new_root_linvel.at[:, fslots].set(v1)
            new_root_angvel = new_root_angvel.at[:, fslots].set(w1)

        return state._replace(
            root_pos=new_root_pos,
            root_quat=new_root_quat,
            root_linvel=new_root_linvel,
            root_angvel=new_root_angvel,
            dof_pos=new_dof_pos,
            dof_vel=new_dof_vel,
        ), warm_out

    # ------------------------------------------------------------------
    def refresh_body_state(self, state: SimState, params: PhysParams) -> SimState:
        """Recompute the per-body world state cache from roots + dofs
        (the reference's refresh_rigid_body_state_tensor, now derived)."""
        body_pos = state.body_pos
        body_quat = state.body_quat
        body_lin = state.body_linvel
        body_ang = state.body_angvel
        for gi in self.groups:
            slots = jnp.asarray(gi.slots)
            didx = jnp.asarray(gi.dof_idx)
            pos, quat, lin, ang = fk(
                gi.topo,
                state.root_pos[:, slots],
                state.root_quat[:, slots],
                state.root_linvel[:, slots],
                state.root_angvel[:, slots],
                state.dof_pos[:, didx],
                state.dof_vel[:, didx],
            )
            bidx = jnp.asarray(gi.body_idx)  # (K, L_real)
            rl = jnp.asarray(gi.real_links)
            body_pos = body_pos.at[:, bidx].set(pos[..., rl, :])
            body_quat = body_quat.at[:, bidx].set(quat[..., rl, :])
            body_lin = body_lin.at[:, bidx].set(lin[..., rl, :])
            body_ang = body_ang.at[:, bidx].set(ang[..., rl, :])
        for grp in (self.free, self.static):
            if grp is not None and len(grp.slots):
                fslots = jnp.asarray(grp.slots)
                fbody = jnp.asarray(grp.body_slot)
                body_pos = body_pos.at[:, fbody].set(state.root_pos[:, fslots])
                body_quat = body_quat.at[:, fbody].set(state.root_quat[:, fslots])
                body_lin = body_lin.at[:, fbody].set(state.root_linvel[:, fslots])
                body_ang = body_ang.at[:, fbody].set(state.root_angvel[:, fslots])
        return state._replace(
            body_pos=body_pos,
            body_quat=body_quat,
            body_linvel=body_lin,
            body_angvel=body_ang,
        )

    # ------------------------------------------------------------------
    def rollout(self, state: SimState, actions: Actions, params: PhysParams, num_steps: int):
        """Scan num_steps with a donated carry: O(1) memory, zero launch
        overhead between steps — the bench fast path."""

        def body(carry, _):
            return self.step(carry, actions, params), None

        out, _ = jax.lax.scan(body, state, None, length=num_steps)
        return out


def v_com(v_origin, w, com_w, p_origin):
    """Velocity of the com point given origin velocity and angular velocity."""
    return v_origin + jnp.cross(w, com_w - p_origin)
