"""CMU humanoid walker (position-controlled 2020 variant).

Walker surface for the reference's walk_humanoid mocap-tracking factory
(reference vnl_ray/tasks/basic_rodent_2020.py:286-337). The humanoid
shares the rat's functional walker design; only the name map differs.
"""

from __future__ import annotations

import numpy as np

from flybody_tpu.envs.rodent_walker import RodentWalker
from flybody_tpu.physics.types import Model


class HumanoidWalker(RodentWalker):
    PREFIX = "walker/"

    def __init__(self, model: Model):
        super().__init__(model)
        names = model.names
        p = self.PREFIX
        root = names["body"].get(p + "root", names["body"].get(
            p + "torso", self.root_body_id))
        self.root_body_id = root
        self.torso_id = root
        self.pelvis_id = names["body"].get(p + "pelvis", root)
        self.lhand_body = names["body"].get(p + "lhand", 0)
        self.rhand_body = names["body"].get(p + "rhand", 0)
        # end effectors: hands, feet, head
        ee = []
        for n in ("lhand", "rhand", "lfoot", "rfoot", "head"):
            bid = names["body"].get(p + n)
            if bid is not None:
                ee.append(bid)
        self.end_effector_bodies = np.asarray(ee, dtype=np.int32)

    def appendages_pos(self, data):
        from flybody_tpu.math import quaternions as mq
        
        tips = data.xpos[self.end_effector_bodies]
        root_pos = data.xpos[self.root_body_id]
        root_quat = data.xquat[self.root_body_id]
        ego = mq.rotate_vec_with_quat(tips - root_pos,
                                      mq.conj_quat(root_quat))
        return ego.reshape(-1)
