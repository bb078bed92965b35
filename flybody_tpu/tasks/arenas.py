"""Procedural terrain arenas: sine bumps, sine trench, random hills.

Re-design of the reference hfield arenas (reference
vnl_ray/tasks/arenas/hills.py: terrain_bowl :18-58, add_sine_bumps :61,
add_sine_trench :82-128) as pure numpy terrain synthesis feeding MuJoCo
heightfields at model build. The trench geometry rule (width vs the
0.604 cm wingspan, reference :341-343) is preserved.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import mujoco

WINGSPAN = 0.604  # cm, reference hills.py:341


@dataclasses.dataclass
class TrenchSpecs:
    """Geometry of the generated trench (reference SineTrench.trench_specs)."""
    center_y: np.ndarray   # (ncol,) trench centerline per x-column
    width: np.ndarray      # (ncol,)
    depth: float


def sine_bumps(nrow: int = 100, ncol: int = 400, n_periods: float = 8.0,
               height: float = 1.0, rng: np.random.RandomState | None = None
               ) -> np.ndarray:
    """Sine bumps along x, uniform along y; normalized [0, 1]."""
    x = np.linspace(0, 2 * np.pi * n_periods, ncol)
    profile = 0.5 * (1.0 + np.sin(x))
    data = np.tile(profile, (nrow, 1))
    return (data * height).astype(np.float32)


def sine_trench(nrow: int = 100, ncol: int = 400, n_periods: float = 4.0,
                width_factor: float = 3.0, amplitude_factor: float = 2.0,
                rng: np.random.RandomState | None = None
                ) -> tuple[np.ndarray, TrenchSpecs]:
    """Sinusoidally wandering trench cut into a raised plateau.

    width >= width_factor * wingspan guarantees non-trivial but passable
    geometry (reference add_sine_trench :82-128, width rule :341-343).
    """
    rng = rng or np.random.RandomState(0)
    data = np.ones((nrow, ncol), np.float32)
    ys = np.linspace(-1.0, 1.0, nrow)
    xs = np.linspace(0, 2 * np.pi * n_periods, ncol)
    # trench centerline wanders as a sine in y (normalized units)
    amp = amplitude_factor * WINGSPAN / 10.0
    center = amp * np.sin(xs + rng.uniform(0, 2 * np.pi))
    width = np.full(ncol, width_factor * WINGSPAN / 10.0, np.float32)
    for c in range(ncol):
        mask = np.abs(ys - center[c]) < width[c] / 2
        data[mask, c] = 0.0
    return data, TrenchSpecs(center_y=center.astype(np.float32),
                             width=width, depth=1.0)


def random_hills(nrow: int = 128, ncol: int = 128, n_bumps: int = 40,
                 rng: np.random.RandomState | None = None) -> np.ndarray:
    """Random smooth bumps (reference terrain_bowl :18-58, sans bowl)."""
    rng = rng or np.random.RandomState(0)
    data = np.zeros((nrow, ncol), np.float32)
    yy, xx = np.mgrid[0:nrow, 0:ncol]
    for _ in range(n_bumps):
        cy, cx = rng.uniform(0, nrow), rng.uniform(0, ncol)
        s = rng.uniform(3, 12)
        a = rng.uniform(0.2, 1.0)
        data += a * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s * s))
    data -= data.min()
    data /= max(data.max(), 1e-9)
    return data.astype(np.float32)


def add_heightfield(spec: mujoco.MjSpec, data: np.ndarray,
                    size=(12.0, 3.0, 0.6, 0.1), pos=(8.0, 0.0, 0.0),
                    name: str = "terrain"):
    """Attach a heightfield geom to the spec worldbody."""
    nrow, ncol = data.shape
    hf = spec.add_hfield(name=name, size=list(size), nrow=nrow, ncol=ncol,
                         userdata=data.reshape(-1).astype(np.float64))
    spec.worldbody.add_geom(name=name, type=mujoco.mjtGeom.mjGEOM_HFIELD,
                            hfieldname=name, pos=list(pos), condim=3)
    return hf
