"""Procedural hfield terrain, generated on-device per episode.

JAX port of the reference arena terrain generators
(flybody/tasks/arenas/hills.py): a random-bump bowl plus either sinusoidal
bumps (SineBumps) or a carved sine trench (SineTrench). The reference
regenerates terrain by rewriting MuJoCo's hfield asset and re-uploading it
to the GL context per episode (hills.py:347-393); here terrain is a plain
per-env device array regenerated inside `reset` with JAX RNG, so thousands
of envs each carry their own world.

Heights are in cm (the reference writes cm values scaled by
hfield_size_z = 1).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

ARENA_HALF_SIZE = 20.0  # cm (reference hills.py dim=20)
GRID_DENSITY = 10  # points per cm
RES = int(2 * ARENA_HALF_SIZE * GRID_DENSITY)  # 400
WING_SPAN = 0.604  # cm, anti-trivial trench-width coupling (hills.py:364)


class TrenchSpec(NamedTuple):
    x_coords: jax.Array  # (L,) trench centerline x, padded
    y_coords: jax.Array  # (L,) centerline y (sine), padded
    valid: jax.Array  # (L,) 0/1


def _bowl(rng, elevation_z, bump_scale=2.0, tanh_rel_radius=0.7,
          tanh_sharpness=8.0, res: int = RES,
          half_size: float = ARENA_HALF_SIZE):
    """Random-bump bowl terrain (reference hills.py:20-59)."""
    bump_res = int(2 * half_size / bump_scale)  # 20
    bumps = jax.random.uniform(rng, (bump_res, bump_res))
    terrain = jax.image.resize(bumps, (res, res), method='cubic')
    terrain = terrain - jnp.min(terrain)
    terrain = terrain / jnp.maximum(jnp.max(terrain), 1e-8)
    terrain = terrain * elevation_z
    axis = jnp.linspace(-1, 1, res)
    xv, yv = jnp.meshgrid(axis, axis)
    r = jnp.sqrt(xv ** 2 + yv ** 2)
    bowl_shape = 0.5 * jnp.tanh(tanh_sharpness * (r - tanh_rel_radius)) + 0.5
    return terrain * bowl_shape


def _gaussian_blur(terrain, sigma_px, max_kernel: int = 31):
    """Separable Gaussian blur with traced sigma (static kernel size)."""
    x = jnp.arange(max_kernel) - (max_kernel - 1) / 2
    w = jnp.exp(-0.5 * (x / jnp.maximum(sigma_px, 1e-3)) ** 2)
    w = w / jnp.sum(w)
    pad = (max_kernel - 1) // 2

    def conv1d(img):
        img_p = jnp.pad(img, ((pad, pad), (0, 0)), mode='edge')
        out = jnp.zeros_like(img)
        for k in range(max_kernel):
            out = out + w[k] * jax.lax.dynamic_slice(
                img_p, (k, 0), img.shape)
        return out

    return conv1d(conv1d(terrain.T).T)


def sine_bumps_terrain(rng, elevation_z_range=(4.0, 5.0),
                       wavelength_range=(10.0, 15.0),
                       height_range=(0.5, 1.0),
                       phase_range=(0.0, 2 * jnp.pi)):
    """SineBumps terrain (reference hills.py:401-472)."""
    r1, r2, r3, r4 = jax.random.split(rng, 4)
    elev = jax.random.uniform(r1, (), minval=elevation_z_range[0],
                              maxval=elevation_z_range[1])
    terrain = _bowl(r2, elev)
    wl = jax.random.uniform(r3, (), minval=wavelength_range[0],
                            maxval=wavelength_range[1])
    ph = jax.random.uniform(r4, (), minval=phase_range[0],
                            maxval=phase_range[1])
    h = jax.random.uniform(jax.random.fold_in(r4, 1), (),
                           minval=height_range[0], maxval=height_range[1])
    x_axis = jnp.linspace(-ARENA_HALF_SIZE, ARENA_HALF_SIZE, RES)
    bumps = h * 0.5 * (jnp.sin(2 * jnp.pi / wl * x_axis + ph) + 1.0)
    terrain = jnp.maximum(bumps[None, :], terrain)
    dummy = TrenchSpec(x_coords=jnp.zeros((RES,)),
                       y_coords=jnp.zeros((RES,)),
                       valid=jnp.zeros((RES,)))
    return terrain, dummy


def sine_trench_terrain(rng, elevation_z_range=(4.0, 5.0),
                        start_offset_range=(-5.0, -3.0),
                        trench_len_range=(4.0, 10.0),
                        phase_range=(0.0, 2 * jnp.pi),
                        wavelength_range=(5.0, 8.0),
                        amplitude_range=(0.35, 0.6),
                        width_range=(0.5, 1.0),
                        height_range=(1.3, 1.3),
                        sigma_range=(0.2, 0.2)):
    """SineTrench terrain (reference hills.py:289-398)."""
    rs = jax.random.split(rng, 9)
    elev = jax.random.uniform(rs[0], (), minval=elevation_z_range[0],
                              maxval=elevation_z_range[1])
    terrain = _bowl(rs[1], elev)

    start_x = jax.random.uniform(rs[2], (), minval=start_offset_range[0],
                                 maxval=start_offset_range[1])
    end_x = start_x + jax.random.uniform(rs[3], (),
                                         minval=trench_len_range[0],
                                         maxval=trench_len_range[1])
    amplitude = jax.random.uniform(rs[4], (), minval=amplitude_range[0],
                                   maxval=amplitude_range[1])
    width = 2 * amplitude + WING_SPAN * jax.random.uniform(
        rs[5], (), minval=width_range[0], maxval=width_range[1])
    phase = jax.random.uniform(rs[6], (), minval=phase_range[0],
                               maxval=phase_range[1])
    wl = jax.random.uniform(rs[7], (), minval=wavelength_range[0],
                            maxval=wavelength_range[1])
    height = jax.random.uniform(rs[8], (), minval=height_range[0],
                                maxval=height_range[1])
    sigma = sigma_range[0] + jnp.zeros(())

    # Grid coordinates (world cm per index).
    x_axis = jnp.linspace(-ARENA_HALF_SIZE, ARENA_HALF_SIZE, RES)
    y_axis = x_axis

    # Trench wall block: height inside [start_x, end_x], carved along the
    # sine centerline with half-width `width/2`.
    sine_at_x = amplitude * jnp.sin(2 * jnp.pi / wl * (x_axis - start_x)
                                    + phase)
    sine0 = amplitude * jnp.sin(phase)
    sine_at_x = sine_at_x - sine0  # entrance centered at y=0
    in_x = (x_axis >= start_x) & (x_axis <= end_x)
    dist_y = jnp.abs(y_axis[:, None] - sine_at_x[None, :])
    wall = jnp.where(in_x[None, :] & (dist_y > width / 2), height, 0.0)
    # Smooth (sigma in cm -> pixels).
    wall = _gaussian_blur(wall, sigma * GRID_DENSITY)
    terrain = jnp.maximum(wall, terrain)

    spec = TrenchSpec(
        x_coords=x_axis,
        y_coords=jnp.where(in_x, sine_at_x, 0.0),
        valid=in_x.astype(terrain.dtype))
    return terrain, spec


def height_at_matmul(grid_s, x, y, stride: int = 1,
                     full_res: int | None = None,
                     half_size: float = ARENA_HALF_SIZE):
    """Bilinear terrain height lookup for a BATCH of points via
    hat-weight matmuls.

    Mathematically identical to `height_at` on the strided sublattice
    `grid_s = terrain[::stride, ::stride]`: the hat function
    max(0, 1 - |f - i|) evaluated at every node IS the bilinear weight
    row (two nonzeros), so height = (wy @ G) . wx rides the MXU. Per-
    point dynamic gathers (height_at) lower to per-lane loops on TPU
    and dominated the eye renderer (~2 s per vision control step at 256
    envs); this form is the eye ray-march's sampler.

    Args: grid_s (R, R); x, y (..., S) world coords; stride: sublattice
    stride relative to the full-res terrain; full_res: the full-res
    node count the world mapping is defined on (default R * stride).
    """
    dtype = grid_s.dtype
    res_s = grid_s.shape[-1]
    fr = full_res if full_res is not None else res_s * stride
    fx = ((x / half_size) * (fr / 2) + (fr - 1) / 2) / stride
    fy = ((y / half_size) * (fr / 2) + (fr - 1) / 2) / stride
    fx = jnp.clip(fx, 0.0, res_s - 1.001)
    fy = jnp.clip(fy, 0.0, res_s - 1.001)
    iota = jnp.arange(res_s, dtype=dtype)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(fx[..., None] - iota))
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(fy[..., None] - iota))
    return jnp.sum((wy @ grid_s) * wx, axis=-1)


def height_at(terrain, x, y, half_size: float = ARENA_HALF_SIZE):
    """Bilinear terrain height lookup at world (x, y); batched."""
    res = terrain.shape[-1]
    fx = (x / half_size) * (res / 2) + (res - 1) / 2
    fy = (y / half_size) * (res / 2) + (res - 1) / 2
    fx = jnp.clip(fx, 0.0, res - 1.001)
    fy = jnp.clip(fy, 0.0, res - 1.001)
    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    tx = fx - x0
    ty = fy - y0
    h00 = terrain[y0, x0]
    h01 = terrain[y0, x0 + 1]
    h10 = terrain[y0 + 1, x0]
    h11 = terrain[y0 + 1, x0 + 1]
    return ((1 - ty) * ((1 - tx) * h00 + tx * h01)
            + ty * ((1 - tx) * h10 + tx * h11))


def nearest_height_at(terrain, x, y, half_size: float = ARENA_HALF_SIZE):
    """Nearest-gridpoint height (matches reference get_hfield_height,
    vision_flight.py:84-98)."""
    res = terrain.shape[-1]
    axis = jnp.linspace(-half_size, half_size, res)
    xi = jnp.argmin(jnp.abs(axis - x))
    yi = jnp.argmin(jnp.abs(axis - y))
    return terrain[yi, xi]
