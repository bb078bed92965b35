"""Fly walker: action routing, specs, and observable functions.

Functional re-design of the reference FruitFly walker's runtime surface
(reference vnl_ray/fruitfly/fruitfly.py:480-708): the walker object holds
only *static* metadata (index maps resolved from the compiled model); every
observable is a pure function of (Data, sensor_mean), vmap-friendly.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from flybody_tpu.math import quaternions as mq
from flybody_tpu.physics import types as T
from flybody_tpu.physics.types import Data, Model


class FlyWalker:
    """Static walker metadata + pure observable/action functions."""

    def __init__(self, model: Model, action_maps: dict):
        self.model = model
        self.action_maps = action_maps
        names = model.names

        self.thorax_id = names["body"]["thorax"]
        self.abdomen_id = names["body"].get("abdomen", 0)
        self.head_id = names["body"].get("head", 0)
        self.thorax_site = names["site"].get("thorax")
        self.hover_site = names["site"].get("hover_up_dir")

        # claw sites (end effectors), present when legs are on
        self.claw_sites = [v for k, v in sorted(names["site"].items())
                           if k.startswith("claw_")]
        # appendages = end effectors + the head site (reference
        # fruitfly.py:440-446)
        self.appendage_sites = list(self.claw_sites)
        if "head" in names["site"]:
            self.appendage_sites.append(names["site"]["head"])
        # sensor addresses by name
        self.sensor_adr = {}
        for name, sid in names["sensor"].items():
            adr = int(np.asarray(model.sensor_adr)[sid])
            dim = int(np.asarray(model.sensor_dim)[sid])
            self.sensor_adr[name] = (adr, dim)

        # observable joints: the reference walker's observable_joints =
        # all scalar joints minus the disabled body parts' (their joints
        # stay in the model but are not observed — reference
        # fruitfly.py:209-247). Model order.
        jt = np.asarray(model.jnt_type)
        scalar = (jt == T.HINGE) | (jt == T.SLIDE)
        obs_names = action_maps.get("observable_joints")
        if obs_names is not None:
            keep = {names["joint"][n] for n in obs_names
                    if n in names["joint"]}
            fly_joints = [j for j in range(model.njnt)
                          if scalar[j] and j in keep]
        else:
            fly_joints = [j for j in range(model.njnt) if scalar[j]]
        self.joint_qposadr = np.asarray(model.jnt_qposadr)[fly_joints]
        self.joint_dofadr = np.asarray(model.jnt_dofadr)[fly_joints]

        # ctrl routing: env action index -> ctrl index (static gather)
        ctrl_src = np.full(model.nu, -1, dtype=np.int32)
        from flybody_tpu.models.fruitfly import ACTION_CLASSES
        for cls in ACTION_CLASSES:
            for ci, ai in zip(action_maps["ctrl"].get(cls, []),
                              action_maps["action"][cls]):
                ctrl_src[ci] = ai
        self.ctrl_from_action = ctrl_src  # (nu,) action index per ctrl slot
        self.action_size = action_maps["total"]

    # -- actions ------------------------------------------------------------
    def apply_action(self, data: Data, action: jnp.ndarray) -> Data:
        """Scatter env action into ctrl (reference apply_action)."""
        # NaN scrub (reference walk_imitation.py:147)
        action = jnp.where(jnp.isnan(action), 0.0, action)
        idx = jnp.asarray(self.ctrl_from_action)
        ctrl = jnp.where(idx >= 0, action[jnp.maximum(idx, 0)], 0.0)
        return data.replace(ctrl=ctrl.astype(data.ctrl.dtype))

    def action_bounds(self, model: Model):
        """(lo, hi) arrays over the env action vector."""
        lo = np.full(self.action_size, -1.0)
        hi = np.full(self.action_size, 1.0)
        cr = np.asarray(model.actuator_ctrlrange)
        for ci, ai in enumerate(self.ctrl_from_action):
            if ai >= 0:
                lo[ai] = cr[ci, 0]
                hi[ai] = cr[ci, 1]
        return lo, hi

    # -- observables ---------------------------------------------------------
    def sensor_obs(self, sensor_mean, name):
        adr, dim = self.sensor_adr[name]
        return sensor_mean[adr:adr + dim]

    def sensors_concat(self, sensor_mean, prefix):
        parts = [self.sensor_obs(sensor_mean, n)
                 for n in sorted(self.sensor_adr) if n.startswith(prefix)]
        return jnp.concatenate(parts) if parts else jnp.zeros((0,))

    def observables(self, model: Model, data: Data, sensor_mean) -> dict:
        """Core observable dict (vestibular + proprioception)."""
        obs = {
            "joints_pos": data.qpos[self.joint_qposadr],
            "joints_vel": data.qvel[self.joint_dofadr],
            "actuator_activation": data.act,
            "gyro": self.sensor_obs(sensor_mean, "gyro"),
            "accelerometer": self.sensor_obs(sensor_mean, "accelerometer"),
            "velocimeter": self.sensor_obs(sensor_mean, "velocimeter"),
            "world_zaxis": data.xmat[self.thorax_id][2, :],
        }
        return obs

    def world_zaxis_hover(self, model: Model, data: Data):
        """World z-axis in the hover (flight-pitch) frame."""
        z = data.xmat[self.thorax_id][2, :]
        if self.hover_site is None:
            return z
        hq = model.site_quat[self.hover_site]
        return mq.rotate_vec_with_quat(z, mq.conj_quat(hq))

    def world_zaxis_body(self, data: Data, body_id: int):
        return data.xmat[body_id][2, :]

    def thorax_height(self, data: Data):
        return data.xpos[self.thorax_id][2]

    def abdomen_height(self, data: Data):
        return data.xpos[self.abdomen_id][2]

    def appendages_pos(self, data: Data):
        """Egocentric appendage positions (claws + head site), flattened
        (reference fruitfly.py:628-638 over appendages :440-446)."""
        if not self.appendage_sites:
            return jnp.zeros((0,))
        tips = data.site_xpos[np.asarray(self.appendage_sites)]
        root_pos = data.xpos[self.thorax_id]
        root_quat = data.xquat[self.thorax_id]
        ego = mq.rotate_vec_with_quat(tips - root_pos,
                                      mq.conj_quat(root_quat))
        return ego.reshape(-1)

    def force_touch_obs(self, sensor_mean):
        return {
            "force": self.sensors_concat(sensor_mean, "force_"),
            "touch": self.sensors_concat(sensor_mean, "touch_"),
        }

    def self_contact(self, model: Model, data: Data):
        """Sum of self-contact normal force magnitudes
        (reference fruitfly.py:640-659). Works on the per-env view:
        warm_sel (Ksum,), warm_f (Ksum, 3)."""
        if model.ncon_max == 0 or data.warm_sel.shape[0] == 0:
            return jnp.zeros(())
        # fly-fly contacts: both geoms on non-world bodies
        from flybody_tpu.physics.actuation import _slot_bodies
        b1, b2 = _slot_bodies(model)
        both_fly = jnp.asarray(((b1 != 0) & (b2 != 0)).astype(np.float32),
                               dtype=data.qpos.dtype)
        flag = both_fly[data.warm_sel]          # (Ksum,)
        return jnp.sum(jnp.abs(data.warm_f[:, 0]) * flag)

    def egocentric_to_world(self, data: Data, vec):
        return mq.rotate_vec_with_quat(vec, data.xquat[self.thorax_id])

    def world_to_egocentric(self, data: Data, vec):
        return mq.rotate_vec_with_quat(
            vec, mq.conj_quat(data.xquat[self.thorax_id]))
