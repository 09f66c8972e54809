"""Shading: texture/bump lookup + BSDF scatter, one dense masked kernel.

Parity with ``kernShadeMaterialProper`` (``src/pathtrace.cu:521-621``) +
``scatterRay`` (``src/interactions.cu:438-542``):

* entry skip for terminated paths (keeps their final color),
* miss -> color = 0, terminate,
* texture albedo override before the emissive test,
* emissive -> color *= albedo * emittance, terminate,
* bump-map shading-normal perturbation (forward-difference heightfield,
  ``src/pathtrace.cu:579-607``),
* material dispatch priority: glass > mirror > transmissive > microfacet >
  diffuse (``src/interactions.cu:455-528``),
* ray-offset epsilons: BABY_EPSILON along the normal for diffuse/mirror,
  LARGER_EPSILON along the new direction for glass/transmissive/microfacet,
* paths that exhaust their bounces keep (and later deposit) their throughput
  -- a deliberate reference behavior kept for image parity.

The megakernel integrator computes every lobe for every lane and selects by
mask (cheap VPU ops); the wavefront integrator runs the same code over
material-sorted buckets.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import RenderConfig
from ..scene.device import DeviceScene, SceneStatic
from ..utils import vec
from ..utils.vec import Vec3
from . import bsdf, texture
from .rays import Intersections, PathState


def lobes_present(static: SceneStatic) -> tuple:
    """Static per-scene lobe presence (glass, mirror, trans, micro): the
    material set is compile-time constant, so absent lobe families are
    skipped entirely at trace time."""
    ms = static.material_consts
    glass = any(m.has_reflective > 0 and m.has_refractive > 0 for m in ms)
    mirror = any(m.has_reflective > 0 for m in ms)
    trans = any(m.has_refractive > 0 for m in ms)
    micro = any(m.roughness >= 0 and m.metallic >= 0 for m in ms)
    return (glass, mirror, trans, micro)


def shade_fake(
    dev: DeviceScene,
    static: SceneStatic,
    paths: PathState,
    isect: Intersections,
    uniforms: jnp.ndarray,
    cfg: RenderConfig,
) -> PathState:
    """The reference's demo shader (``shadeFakeMaterial``,
    ``src/pathtrace.cu:459-502``): rasterizer-style pseudo-lighting with
    multiplicative noise; no BSDF, no scattering, no bounce decrement.
    Selected with ``RenderConfig(shader="fake")`` -- a debugging aid, exactly
    as in the reference."""
    mats = dev.materials
    hit = isect.t > 0.0
    mid = jnp.clip(isect.material_id, 0, static.num_materials - 1)
    mat_color = vec.select_gather(mats.color, mid)
    emittance = mats.emittance[mid]

    light_term = vec.dot(isect.normal, Vec3.from_scalar(0.0, 1.0, 0.0))
    lit = mat_color * (light_term * 0.3) + mat_color * ((1.0 - isect.t * 0.02) * 0.7)
    noise = uniforms[0]
    emissive = emittance > 0.0
    shaded = vec.where(emissive, mat_color * emittance, lit * noise)

    color = vec.where(hit, paths.color * shaded, Vec3.zeros(hit.shape))
    return PathState(
        origin=paths.origin,
        direction=paths.direction,
        color=color,
        pixel=paths.pixel,
        bounces=paths.bounces,
    )


def textured_surface(
    dev: DeviceScene,
    static: SceneStatic,
    isect: Intersections,
    mid: jnp.ndarray,  # clipped material id per lane
    albedo: Vec3,  # base (material-color) albedo per lane
    live: jnp.ndarray = None,  # lanes whose shade result is consumed
):
    """Texture albedo override + bump-map shading normal for one lane set.

    Shared verbatim by the unfused ``shade`` and the fused mesh path's
    XLA mesh-surface stage (same formulas -> bitwise-identical results
    across integrators).  ``live`` marks lanes whose result survives
    downstream masking (hit lanes); dead lanes' texel fetches clamp to row
    0 so they stay cache-resident instead of thrashing HBM.
    Returns ``(albedo, shading_normal)``."""
    ms = static.material_consts

    def chain(get, dtype=jnp.float32):
        out = jnp.full(mid.shape, get(ms[0]), dtype)
        for i in range(1, len(ms)):
            out = jnp.where(mid == i, dtype(get(ms[i])), out)
        return out

    # Per-lane material texture/bump ids + per-lane texture dims resolve as
    # constant select chains (materials and texture dims are static), not
    # device gathers.
    tex_id = chain(lambda m: m.texture_id, jnp.int32)
    bump_id = chain(lambda m: m.bump_id, jnp.int32)
    scale = chain(lambda m: m.bump_scale)

    dims = static.tex_dims or ((1, 1),)

    def dim_chain(idv, axis):
        # i32 like TextureTable.width/height (the wrap arithmetic in
        # _bilinear_prep is integer mod).
        out = jnp.full(idv.shape, dims[0][axis], jnp.int32)
        for i in range(1, len(dims)):
            out = jnp.where(idv == i, jnp.int32(dims[i][axis]), out)
        return out

    nt = static.num_textures
    tid = jnp.clip(tex_id, 0, max(nt - 1, 0))
    bid = jnp.clip(bump_id, 0, max(nt - 1, 0))
    tw_t, th_t = dim_chain(tid, 0), dim_chain(tid, 1)
    tw_b, th_b = dim_chain(bid, 0), dim_chain(bid, 1)
    du = 1.0 / tw_b.astype(jnp.float32)
    dv = 1.0 / th_b.astype(jnp.float32)

    # ---- texel-quad gather(s): albedo + precomputed bump gradients -------
    # (src/pathtrace.cu:549-553 texture override; :579-607 bump heights)
    # When no material pairs a texture with a DIFFERENT bump map (static
    # per scene), both come from one packed-row gather.
    single_quad = all(
        m.texture_id < 0 or m.bump_id < 0 or m.texture_id == m.bump_id
        for m in ms
    )
    tex_rgb, gdu_raw, gdv_raw = texture.sample_surface(
        dev.textures, nt, static.tex_wmax, static.tex_hmax,
        tex_id, bump_id, isect.uv_u, isect.uv_v,
        tw_t, th_t, tw_b, th_b, live=live, single_quad=single_quad,
    )
    albedo = vec.where(tex_id >= 0, tex_rgb, albedo)

    # ---- shading normal: bump-map perturbation ---------------------------
    ng = isect.normal
    has_bump = bump_id >= 0
    dhdu = gdu_raw / du
    dhdv = gdv_raw / dv
    dpdu_p = isect.dpdu + ng * (scale * dhdu)
    dpdv_p = isect.dpdv + ng * (scale * dhdv)
    sn = vec.normalize(vec.cross(dpdu_p, dpdv_p))
    sn = vec.where(vec.dot(sn, ng) < 0.0, -sn, sn)
    shading_normal = vec.where(has_bump, sn, ng)
    return albedo, shading_normal


def shade(
    dev: DeviceScene,
    static: SceneStatic,
    paths: PathState,
    isect: Intersections,
    uniforms: jnp.ndarray,  # [4, N] U[0,1)
    cfg: RenderConfig,
) -> PathState:
    if cfg.shader == "fake":
        return shade_fake(dev, static, paths, isect, uniforms, cfg)
    mats = dev.materials
    n = paths.pixel.shape[0]

    was_alive = paths.bounces > 0
    hit = isect.t > 0.0

    mid = jnp.clip(isect.material_id, 0, static.num_materials - 1)
    albedo = vec.select_gather(mats.color, mid)
    emittance = mats.emittance[mid]
    has_refl = mats.has_reflective[mid]
    has_refr = mats.has_refractive[mid]
    ior = mats.ior[mid]
    roughness = mats.roughness[mid]
    metallic = mats.metallic[mid]

    shading_normal = isect.normal
    if static.num_textures > 0:
        albedo, shading_normal = textured_surface(
            dev, static, isect, mid, albedo, live=was_alive & hit
        )

    return scatter_compose(
        cfg,
        paths,
        isect,
        shading_normal,
        albedo,
        emittance,
        has_refl,
        has_refr,
        ior,
        roughness,
        metallic,
        uniforms,
        lobes=lobes_present(static),
    )


def scatter_compose(
    cfg: RenderConfig,
    paths: PathState,
    isect: Intersections,
    shading_normal: Vec3,
    albedo: Vec3,
    emittance: jnp.ndarray,
    has_refl: jnp.ndarray,
    has_refr: jnp.ndarray,
    ior: jnp.ndarray,
    roughness: jnp.ndarray,
    metallic: jnp.ndarray,
    uniforms,  # indexable: uniforms[0..2], each shaped like paths fields
    lobes: tuple = (True, True, True, True),  # (glass, mirror, trans, micro)
) -> PathState:
    """scatterRay + terminal-state composition with material parameters
    already resolved per lane.  Shape-agnostic (runs unchanged inside the
    fused Pallas bounce kernel on block-shaped arrays).

    ``lobes`` statically disables lobe families no material in the scene
    uses (the scene's material set is compile-time constant): an all-diffuse
    scene then pays for the diffuse lobe only.  Semantics are unchanged --
    a disabled lobe's selection mask would have been all-False anyway.
    """
    lobe_glass, lobe_mirror, lobe_trans, lobe_micro = lobes
    was_alive = paths.bounces > 0
    hit = isect.t > 0.0

    # ---- scatter: evaluate present lobes, select by material flags --------
    wo_ray = paths.direction  # reference passes the raw ray direction as wo
    normal = shading_normal
    u_choice = uniforms[0]
    xi0 = uniforms[1]
    xi1 = uniforms[2]

    false = jnp.zeros(hit.shape, bool)
    is_glass = (has_refr > 0.0) & (has_refl > 0.0) if lobe_glass else false
    is_mirror = ((has_refl > 0.0) & ~is_glass) if lobe_mirror else false
    is_trans = (
        (has_refr > 0.0) & ~is_glass & ~is_mirror if lobe_trans else false
    )
    is_micro = (
        (roughness >= 0.0) & (metallic >= 0.0)
        & ~is_glass & ~is_mirror & ~is_trans
        if lobe_micro
        else false
    )

    diffuse = bsdf.sample_f_diffuse(albedo, normal, xi0, xi1)

    # New direction (normalized, as scatterRay does for every branch) and
    # throughput multiplier per branch.
    wi = diffuse.wi
    if lobe_micro:
        wo_world = -vec.normalize(wo_ray)
        micro = bsdf.sample_f_cook_torrance(
            albedo, normal, wo_world, roughness, metallic, u_choice, xi0, xi1
        )
        wi = vec.where(is_micro, micro.wi, wi)
    if lobe_trans:
        trans, _ = bsdf.sample_f_specular_transmission(
            albedo, normal, wo_ray, ior, cfg.baby_epsilon
        )
        wi = vec.where(is_trans, trans.wi, wi)
    if lobe_mirror:
        mirror = bsdf.sample_f_specular_reflection(albedo, normal, wo_ray)
        wi = vec.where(is_mirror, mirror.wi, wi)
    if lobe_glass:
        glass = bsdf.sample_f_glass(
            albedo, normal, wo_ray, ior, u_choice, cfg.baby_epsilon
        )
        wi = vec.where(is_glass, glass.wi, wi)
    new_dir = vec.normalize(wi)

    cos_theta = jnp.maximum(0.0, vec.dot(normal, new_dir))
    # pdf == 0 can occur when the cosine sample lands exactly on the
    # hemisphere rim (u01 can return 0); the reference divides regardless
    # (NaN on its measure-zero LCG stream). Guard to keep the film finite.
    diffuse_pdf_ok = diffuse.pdf > 0.0
    diffuse_mult = vec.where(
        diffuse_pdf_ok,
        diffuse.f * (cos_theta / jnp.where(diffuse_pdf_ok, diffuse.pdf, 1.0)),
        Vec3.zeros(cos_theta.shape),
    )
    mult = diffuse_mult
    if lobe_micro:
        micro_mult = vec.where(
            micro.pdf > 0.0,
            micro.f * (cos_theta / jnp.where(micro.pdf > 0.0, micro.pdf, 1.0)),
            Vec3.full(cos_theta.shape, 1.0, 1.0, 1.0),  # pdf<=0: color as-is
        )
        mult = vec.where(is_micro, micro_mult, mult)
    if lobe_trans:
        mult = vec.where(is_trans, trans.f, mult)
    if lobe_mirror:
        mult = vec.where(is_mirror, mirror.f, mult)
    if lobe_glass:
        mult = vec.where(is_glass, glass.f, mult)

    # New origin: epsilon offset differs per branch (interactions.cu:458-533).
    intersect_pt = paths.origin + paths.direction * isect.t
    off_normal = intersect_pt + normal * cfg.baby_epsilon  # diffuse, mirror
    off_dir = intersect_pt + new_dir * cfg.larger_epsilon  # glass/trans/micro
    new_origin = vec.where(is_glass | is_trans | is_micro, off_dir, off_normal)

    # ---- compose final updates -------------------------------------------
    emissive = emittance > 0.0
    scatter_mask = was_alive & hit & ~emissive
    emit_mask = was_alive & hit & emissive
    miss_mask = was_alive & ~hit

    color = paths.color
    color = vec.where(emit_mask, color * (albedo * emittance), color)
    color = vec.where(miss_mask, Vec3.zeros(color.x.shape), color)
    color = vec.where(scatter_mask, color * mult, color)

    bounces = paths.bounces
    bounces = jnp.where(emit_mask | miss_mask, 0, bounces)
    bounces = jnp.where(scatter_mask, bounces - 1, bounces)

    origin = vec.where(scatter_mask, new_origin, paths.origin)
    direction = vec.where(scatter_mask, new_dir, paths.direction)

    return PathState(
        origin=origin,
        direction=direction,
        color=color,
        pixel=paths.pixel,
        bounces=bounces,
    )
