"""Direction samplers and pdf evaluators, driven by explicit uniforms.

Every sampler takes its random numbers as explicit [..., ] uniform arrays in
[0, 1) instead of drawing from global state (the reference uses a shared
``std::rand()`` from all threads, src/utility.h:20 — a data race we replace
with counter-based ``jax.random`` streams whose draws are laid out in fixed
slots so a NumPy oracle can replay them exactly; see tests/oracle.py).

Semantics match reference src/utility.h:30-69 and src/pdf.h.
"""

from __future__ import annotations

import jax.numpy as jnp

from cpu_ray_tracing_implementation_tpu.ops import vecmath as vm

PI = 3.14159265358979323846
INV_4PI = 1.0 / (4.0 * PI)


def unit_sphere_dir(u1: jnp.ndarray, u2: jnp.ndarray) -> jnp.ndarray:
    """Uniform direction on the unit sphere (src/utility.h:30-43).

    The reference's ``random_in_unit_sphere`` actually returns a point *on*
    the sphere (inverse-CDF in cos(theta)); we keep that exact construction:
    y is the polar axis.
    """
    cos_theta = 1.0 - 2.0 * u1
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    phi = 2.0 * PI * u2
    return jnp.stack(
        [sin_theta * jnp.cos(phi), cos_theta, sin_theta * jnp.sin(phi)], axis=-1
    )


def cosine_local_dir(u1: jnp.ndarray, u2: jnp.ndarray) -> jnp.ndarray:
    """Cosine-weighted hemisphere direction in ONB-local frame, y up
    (src/utility.h:62-69 ``random_cosine_direction`` with y = sqrt(1-r2))."""
    phi = 2.0 * PI * u1
    sq_r2 = jnp.sqrt(u2)
    return jnp.stack(
        [jnp.cos(phi) * sq_r2, jnp.sqrt(jnp.maximum(1.0 - u2, 0.0)), jnp.sin(phi) * sq_r2],
        axis=-1,
    )


def _cosine_impl() -> str:
    """Construction for cosine_dir (env CRT_COSINE, read at trace time):
    'sphere' (default) = normalize(n + unit_sphere_dir) — Shirley's
    lambertian construction (RTiOW §9.4): a uniform point on the unit
    sphere about the normal tip gives an exactly cosine-weighted
    direction, with no per-lane ONB build or basis transform (the
    shading stage's measured hot spot); 'onb' = the reference's
    pdf-framework construction (src/pdf.h:34-45), kept for replay of the
    round-1/2 streams."""
    import os

    return os.environ.get("CRT_COSINE", "sphere")


def cosine_dir(normal: jnp.ndarray, u1: jnp.ndarray, u2: jnp.ndarray) -> jnp.ndarray:
    """Cosine-weighted direction about unit ``normal`` (src/pdf.h:34-45).

    Both constructions sample the identical cos(theta)/pi density
    (statistically asserted in tests/test_sampling.py for each); they
    differ only in which direction a given (u1, u2) maps to.
    """
    if _cosine_impl() == "onb":
        x, y, z = vm.onb_from_normal(normal)
        return vm.onb_transform(cosine_local_dir(u1, u2), x, y, z)
    s = unit_sphere_dir(u1, u2)
    d = normal + s
    # s == -normal (measure-zero): fall back to the normal itself, like the
    # reference's lambertian near_zero guard (src/material.h:66-68)
    degenerate = (vm.length_sq(d) < 1e-12)[..., None]
    return vm.normalize(jnp.where(degenerate, normal, d))


def disk_sample(u1: jnp.ndarray, u2: jnp.ndarray) -> jnp.ndarray:
    """Uniform point in the unit disk, z = 0.

    Documented divergence: the reference rejection-samples
    (src/utility.h:47-53); we use the closed-form sqrt/angle map (identical
    distribution, fixed uniform consumption — required for SPMD).
    """
    r = jnp.sqrt(u1)
    phi = 2.0 * PI * u2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), jnp.zeros_like(r)], axis=-1)


def cosine_pdf(normal: jnp.ndarray, direction: jnp.ndarray) -> jnp.ndarray:
    """pdf of the cosine hemisphere sampler: max(0, cos(theta))/pi
    (src/pdf.h:37-40). ``normal`` must be unit; ``direction`` need not be."""
    cos_theta = vm.dot(vm.normalize(direction), normal)
    return jnp.maximum(0.0, cos_theta / PI)


def sphere_pdf(direction: jnp.ndarray) -> jnp.ndarray:
    """pdf of the uniform sphere sampler: 1/(4 pi) (src/pdf.h:15-20)."""
    return jnp.full(direction.shape[:-1], INV_4PI, direction.dtype)


def cone_dir(axis_unit: jnp.ndarray, cos_max: jnp.ndarray,
             u1: jnp.ndarray, u2: jnp.ndarray) -> jnp.ndarray:
    """Uniform direction in the cone of half-angle acos(cos_max) about
    ``axis_unit`` — the solid-angle sphere-light sampler.

    This is the *correct* construction for sampling a sphere from outside
    (Shirley, Rest of Your Life §12); the reference's ``sphere::random``
    ignores the origin entirely (src/sphere.h:81, a documented placeholder
    bug — SURVEY.md appendix item 3). We implement the right math and pair
    it with ``cone_pdf`` so the estimator stays unbiased.
    """
    z = 1.0 + u2 * (cos_max - 1.0)           # cos(theta) in [cos_max, 1]
    phi = 2.0 * PI * u1
    s = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    local = jnp.stack([jnp.cos(phi) * s, z, jnp.sin(phi) * s], axis=-1)
    x, y, zb = vm.onb_from_normal(axis_unit)
    return vm.onb_transform(local, x, y, zb)


def cone_pdf(cos_max: jnp.ndarray) -> jnp.ndarray:
    """Solid-angle pdf of ``cone_dir``: 1 / (2 pi (1 - cos_max)), guarded
    against the degenerate full-closure cone (cos_max -> 1)."""
    solid = 2.0 * PI * jnp.maximum(1.0 - cos_max, 1e-8)
    return 1.0 / solid


def schlick_reflectance(cosine: jnp.ndarray, refraction_index: jnp.ndarray) -> jnp.ndarray:
    """Schlick's approximation (src/material.h:135-139)."""
    r0 = (1.0 - refraction_index) / (1.0 + refraction_index)
    r0 = r0 * r0
    one_minus = 1.0 - cosine
    return r0 + (1.0 - r0) * one_minus ** 5
