"""CCD iteration-count sweep: accuracy vs PGD iterations, cold vs warm.

Drives the full fly (walk_on_ball env model) through real substeps, and at
each substep runs the gated narrowphase at several iteration counts, seeded
either by the center-line direction (cold, the production default) or by the
converged direction from the PREVIOUS substep on the same pair (warm). Error
is measured against a 128-iteration converged run at the same state.

Output: per-class max |dist - dist*| in meters over the trajectory, per
(iters, seed) cell — the data behind the production ccd_iters knob and the
warm-start design (PERF.md ccd levers).
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp
import numpy as np

from flybody_tpu.fly_envs import walk_on_ball
from flybody_tpu.physics import ccd as ccd_mod
from flybody_tpu.physics import forward as F


def narrow_all(m, d, iters, u0=None):
    """Run narrowphase on ALL nccd pairs (no gating) at this state."""
    dtype = d.qpos.dtype
    g1 = np.asarray(m.ccd_geom1)
    g2 = np.asarray(m.ccd_geom2)
    core = m.ccd_core.astype(dtype)            # (nccd, 10)
    p1 = d.geom_xpos[g1]
    p2 = d.geom_xpos[g2]
    R1 = d.geom_xmat[g1]
    R2 = d.geom_xmat[g2]
    outs = []
    for (ax1, ax2, start, n, _) in m.ccd_classes:
        seg = slice(start, start + n)
        c = lambda sl: jnp.moveaxis(core[seg][:, sl, None], 0, 0)
        prm1 = (core[seg][:, 0:3, None] * jnp.ones_like(p1[seg][:, :1]),
                core[seg][:, 3:4, None] * jnp.ones_like(p1[seg][:, :1]),
                core[seg][:, 4:5, None] * jnp.ones_like(p1[seg][:, :1]),
                ax1)
        prm2 = (core[seg][:, 5:8, None] * jnp.ones_like(p1[seg][:, :1]),
                core[seg][:, 8:9, None] * jnp.ones_like(p1[seg][:, :1]),
                core[seg][:, 9:10, None] * jnp.ones_like(p1[seg][:, :1]),
                ax2)
        useg = None if u0 is None else u0[seg]
        dist, pos, nrm = ccd_mod.narrowphase(
            p1[seg], R1[seg], prm1, p2[seg], R2[seg], prm2,
            iters=iters, u0=useg)
        outs.append((dist, nrm))
    dist = jnp.concatenate([o[0] for o in outs], axis=0)
    nrm = jnp.concatenate([o[1] for o in outs], axis=0)
    return dist, nrm


def main():
    n_sub = int(os.environ.get("SWEEP_SUBSTEPS", 20))
    env = walk_on_ball()
    m = env.model
    rng = jax.random.PRNGKey(0)
    state = jax.jit(env.reset)(jax.random.split(rng, 1))
    d = state.data
    step = jax.jit(lambda dd: F.step(m, dd))
    nsweep = (4, 8, 12, 16, 24, 32)

    # converged + sweep runs per substep
    ref_fn = jax.jit(lambda dd: narrow_all(m, dd, 128))
    cold_fns = {it: jax.jit(lambda dd, it=it: narrow_all(m, dd, it))
                for it in nsweep}
    warm_fns = {it: jax.jit(lambda dd, u, it=it: narrow_all(m, dd, it, u))
                for it in nsweep}

    classes = m.ccd_classes
    err_cold = {it: np.zeros(len(classes)) for it in nsweep}
    err_warm = {it: np.zeros(len(classes)) for it in nsweep}
    prev_u = None
    # only near-contact pairs matter for solver behavior
    NEAR = 0.005  # 5 mm band around contact

    for t in range(n_sub):
        d = step(d)
        dist_ref, u_ref = ref_fn(d)
        for it in nsweep:
            dc, _ = cold_fns[it](d)
            ec = np.abs(np.asarray(dc - dist_ref))[:, 0]
            if prev_u is not None:
                dw, _ = warm_fns[it](d, prev_u)
                ew = np.abs(np.asarray(dw - dist_ref))[:, 0]
            else:
                ew = ec
            mask = np.asarray(dist_ref)[:, 0] < NEAR
            for ci, (_, _, start, n, _) in enumerate(classes):
                seg = slice(start, start + n)
                msk = mask[seg]
                if msk.any():
                    err_cold[it][ci] = max(err_cold[it][ci],
                                           ec[seg][msk].max())
                    err_warm[it][ci] = max(err_warm[it][ci],
                                           ew[seg][msk].max())
        prev_u = u_ref

    print(f"max |dist - dist*| (m) over {n_sub} substeps, near-contact "
          f"(<{NEAR} m) pairs only")
    hdr = "class(ax1,ax2,n)      " + "".join(f"{it:>11d}" for it in nsweep)
    print(hdr + "   seed")
    for ci, (a1, a2, start, n, _) in enumerate(classes):
        row_c = "".join(f"{err_cold[it][ci]:11.2e}" for it in nsweep)
        row_w = "".join(f"{err_warm[it][ci]:11.2e}" for it in nsweep)
        print(f"({int(a1)},{int(a2)},n={n:4d})        " + row_c + "   cold")
        print(f"                      " + row_w + "   warm")


if __name__ == "__main__":
    main()
