"""Rodent (rat) walker: action routing, specs, and observable functions.

Functional analog of the dm_control rodent walker surface used by the
reference rodent tasks (reference vnl_ray/tasks/basic_rodent_2020.py uses
dm_control.locomotion.walkers.rodent.Rat). Like FlyWalker, this object
holds only *static* metadata resolved from the compiled model; every
observable is a pure function of (Data, sensor_mean), vmap-friendly.

Observable set mirrors the Rat's enabled proprioception/kinematic/dynamic
sensors: joints_pos/vel, actuator activation, tendons, IMU (gyro/
accelerometer/velocimeter), touch (palms + soles), world z-axis, and
egocentric end-effector (appendage) positions.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from flybody_tpu.math import quaternions as mq
from flybody_tpu.physics import types as T
from flybody_tpu.physics.types import Data, Model


class RodentWalker:
    """Static rat walker metadata + pure observable/action functions."""

    PREFIX = "walker/"

    def __init__(self, model: Model):
        self.model = model
        names = model.names
        p = self.PREFIX

        root_candidates = [p + "torso", p + "root", p + "thorax"]
        self.root_body_id = next(names["body"][n] for n in root_candidates
                                 if n in names["body"])
        self.torso_id = self.root_body_id
        self.pelvis_id = names["body"].get(p + "pelvis", self.root_body_id)
        self.head_site = names["site"].get(p + "head")
        self.head_body_id = names["body"].get(p + "skull",
                                              names["body"].get(p + "head", 0))
        self.lhand_body = names["body"].get(p + "hand_L", 0)
        self.rhand_body = names["body"].get(p + "hand_R", 0)

        # end effectors: dm_control Rat.end_effectors = the BODIES
        # (lower_arm_R, lower_arm_L, foot_R, foot_L) in that order;
        # appendages = end_effectors + head (value-verified against the
        # reference env in tests/test_reference_env_parity.py)
        ee_body_names = ["lower_arm_R", "lower_arm_L", "foot_R", "foot_L"]
        self.end_effector_bodies = np.asarray(
            [names["body"][p + n] for n in ee_body_names
             if p + n in names["body"]], dtype=np.int32)
        # fallback for models without those bodies: limb-tip sites
        self.end_effector_sites = np.asarray(
            [names["site"][p + n]
             for n in ["palm_L", "palm_R", "sole_L", "sole_R"]
             if p + n in names["site"]], dtype=np.int32)
        self.n_limb_tips = (len(self.end_effector_bodies)
                            or len(self.end_effector_sites))

        # sensor addresses by (unprefixed) name
        self.sensor_adr = {}
        for name, sid in names["sensor"].items():
            short = name[len(p):] if name.startswith(p) else name
            adr = int(np.asarray(model.sensor_adr)[sid])
            dim = int(np.asarray(model.sensor_dim)[sid])
            self.sensor_adr[short] = (adr, dim)

        # canonical IMU aliases (the CMU humanoid names its root sensors
        # sensor_root_*)
        for canon, cands in {
                "gyro": ("gyro", "sensor_root_gyro"),
                "accelerometer": ("accelerometer", "sensor_root_accel"),
                "velocimeter": ("velocimeter", "sensor_root_veloc")}.items():
            for c in cands:
                if c in self.sensor_adr:
                    self.sensor_adr[canon] = self.sensor_adr[c]
                    break

        # mocap joints: all scalar joints (order = model order); excludes
        # the root free joint. Used by the tracking features
        # (dm_control walker.mocap_joints analog).
        jt = np.asarray(model.jnt_type)
        scalar = (jt == T.HINGE) | (jt == T.SLIDE)
        joints = [j for j in range(model.njnt) if scalar[j]]
        self.joint_qposadr = np.asarray(model.jnt_qposadr)[joints]
        self.joint_dofadr = np.asarray(model.jnt_dofadr)[joints]
        # OBSERVABLE joints: dm_control walkers observe the ACTUATED
        # joints in actuator order (legacy_base.Walker.observable_joints;
        # the rat observes 30 of its 67 scalar joints — value-verified
        # vs the reference env)
        trn = np.asarray(model.actuator_trntype)
        trnid = np.asarray(model.actuator_trnid)[:, 0]
        ojs = [int(trnid[a]) for a in range(model.nu)
               if trn[a] == T.TRN_JOINT]
        if not ojs:
            ojs = joints
        self.obs_joint_qposadr = np.asarray(model.jnt_qposadr)[ojs]
        self.obs_joint_dofadr = np.asarray(model.jnt_dofadr)[ojs]
        # free-joint qpos address (root pose) if present
        free = [j for j in range(model.njnt) if jt[j] == T.FREE]
        self.root_qposadr = (int(np.asarray(model.jnt_qposadr)[free[0]])
                             if free else None)

        # all walker bodies (subtree of the attachment frame), for mocap
        # tracking features (dm_control mocap_tracking_bodies analog)
        parent = np.asarray(model.body_parentid)
        att = names["body"].get(p.rstrip("/"), self.root_body_id)
        in_walker = np.zeros(model.nbody, bool)
        in_walker[att] = True
        for b in range(1, model.nbody):
            if in_walker[parent[b]]:
                in_walker[b] = True
        in_walker[att] = False  # exclude the massless attachment frame
        self.mocap_tracking_bodies = np.nonzero(in_walker)[0].astype(np.int32)

        # walker geom ids, ground geoms, and the disallowed-contact set
        # (torso/pelvis/cervical vertebrae touching ground terminates the
        # corridor task; reference rodent_tasks_modified.py:205-218)
        geom_body = np.asarray(model.geom_bodyid)
        self.walker_geoms = np.nonzero(in_walker[geom_body])[0]
        bad = ("collision_pelvis", "collision_torso", "vertebra_C1_",
               "vertebra_C3_")
        self.nonfoot_geoms = np.asarray(
            [g for n, g in names["geom"].items()
             if n.startswith(p)
             and any(b in n[len(p):] for b in bad)], dtype=np.int32)
        self.ground_geoms = np.asarray(
            [g for n, g in names["geom"].items()
             if not n.startswith(p)], dtype=np.int32)

        self.action_size = model.nu

    # -- actions ------------------------------------------------------------
    def apply_action(self, data: Data, action: jnp.ndarray) -> Data:
        action = jnp.where(jnp.isnan(action), 0.0, action)
        return data.replace(ctrl=action.astype(data.ctrl.dtype))

    def action_bounds(self, model: Model):
        cr = np.asarray(model.actuator_ctrlrange)
        return cr[:, 0].copy(), cr[:, 1].copy()

    # -- observables --------------------------------------------------------
    def sensor_obs(self, sensor_mean, name):
        adr, dim = self.sensor_adr[name]
        return sensor_mean[adr:adr + dim]

    def observables(self, model: Model, data: Data, sensor_mean) -> dict:
        app = self.appendages_pos(data)
        obs = {
            "joints_pos": data.qpos[self.obs_joint_qposadr],
            "joints_vel": data.qvel[self.obs_joint_dofadr],
            "actuator_activation": data.act,
            # dm_control kinematic-sensor observable names (reference
            # rodent_tasks obs set; verified value-level in
            # tests/test_reference_env_parity.py::TestRodentBowlParity)
            "sensors_gyro": self.sensor_obs(sensor_mean, "gyro"),
            "sensors_accelerometer":
                self.sensor_obs(sensor_mean, "accelerometer"),
            "sensors_velocimeter":
                self.sensor_obs(sensor_mean, "velocimeter"),
            "world_zaxis": data.xmat[self.root_body_id][2, :],
            "appendages_pos": app,
            "end_effectors_pos": app[:3 * self.n_limb_tips],
            "body_height": data.xpos[self.root_body_id][2],
            # the rat model defines no force/torque sensors: dm_control
            # exposes these as empty observables (shape (0,))
            "sensors_force": jnp.zeros((0,), data.qpos.dtype),
            "sensors_torque": jnp.zeros((0,), data.qpos.dtype),
        }
        if model.ntendon:
            obs["tendons_pos"] = data.ten_length
            obs["tendons_vel"] = data.ten_velocity
        touch = [self.sensor_obs(sensor_mean, n)
                 for n in sorted(self.sensor_adr)
                 if n.startswith("palm") or n.startswith("sole")
                 or n.startswith("sensor_touch")]
        if touch:
            obs["sensors_touch"] = jnp.concatenate(touch)
        return obs

    def appendages_pos(self, data: Data):
        """Egocentric end-effector + head positions, flattened
        (dm_control order: lower_arm_R, lower_arm_L, foot_R, foot_L,
        head; verified value-level vs the reference env)."""
        if len(self.end_effector_bodies):
            tips = data.xpos[self.end_effector_bodies]
        else:
            tips = data.site_xpos[self.end_effector_sites]
        if self.head_site is not None:
            head = data.site_xpos[self.head_site][None]
            tips = jnp.concatenate([tips, head], axis=0)
        root_pos = data.xpos[self.root_body_id]
        root_quat = data.xquat[self.root_body_id]
        ego = mq.rotate_vec_with_quat(tips - root_pos,
                                      mq.conj_quat(root_quat))
        return ego.reshape(-1)

    def origin_obs(self, data: Data):
        """World origin in the torso frame (reference Escape _origin)."""
        xmat = data.xmat[self.root_body_id]
        return -xmat @ data.xpos[self.root_body_id]

    # -- task helpers -------------------------------------------------------
    def upright_zz(self, data: Data):
        """min(torso_zz, pelvis_zz): cosine of tilt used by the upright
        reward (dm_control escape._upright_reward; the rat has a pelvis)."""
        return jnp.minimum(data.xmat[self.torso_id][2, 2],
                           data.xmat[self.pelvis_id][2, 2])

    def aliveness(self, data: Data):
        """In [-1, 0]: 0 upright, -1 upside down (dm_control Rat
        .aliveness = (torso_zz - 1)/2)."""
        return 0.5 * (data.xmat[self.torso_id][2, 2] - 1.0)

    def subtree_linvel(self, sensor_mean):
        """Torso subtree linear velocity (the rat's subtreelinvel sensor)."""
        return self.sensor_obs(sensor_mean, "torso")

    def head_pos(self, data: Data):
        if self.head_site is not None:
            return data.site_xpos[self.head_site]
        return data.xpos[self.root_body_id]

    def contact_flag(self, model: Model, data: Data, geoms_a, geoms_b):
        """1.0 if any active contact joins a geom of set a with one of set
        b (per-env view over the selected contact slots)."""
        if model.ncon_max == 0 or data.warm_sel.shape[0] == 0:
            return jnp.zeros(())
        g1 = np.asarray(model.pair_geom1)
        g2 = np.asarray(model.pair_geom2)
        in_a = np.isin(g1, geoms_a) & np.isin(g2, geoms_b)
        in_b = np.isin(g1, geoms_b) & np.isin(g2, geoms_a)
        mask = jnp.asarray((in_a | in_b).astype(np.float32))
        flag = mask[data.warm_sel]
        hit = jnp.sum(jnp.abs(data.warm_f[:, 0]) * flag)
        return (hit > 0).astype(data.qpos.dtype)
