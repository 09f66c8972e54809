"""Fused Pallas bounce kernel for analytic-primitive scenes.

The unfused megakernel already keeps the whole iteration in one jit, but XLA
materializes hundreds of [N] intermediates per bounce in HBM: measured on
v5e, a cornell-class iteration is ~23 ms/frame and entirely HBM-bound.  This
kernel fuses intersect + shade for one bounce into a single Pallas program:
path state streams HBM->VMEM once per bounce, all intermediates live in
VMEM, and both the primitive transforms (``GeomConst``) and the material
table (``MaterialConst``) are Python constants that fold into the
instruction stream -- no memory traffic at all for scene data.

The kernel body literally calls the same shape-agnostic building blocks as
the unfused path (``intersect_scene`` with the statically-skipped mesh
branch, ``shade.scatter_compose``), so behavior is identical by
construction; only float re-association differs (Mosaic vs XLA fusion
order).

Applicable when: no triangles, no textures, shader == "full".  (Mesh scenes
use the MXU intersector; textures need gathers that Mosaic can't lower.)
RNG uniforms are drawn OUTSIDE (same threefry streams as every other
integrator path) and streamed in as inputs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RenderConfig
from ..scene.device import SceneStatic
from ..utils import prng
from ..utils import vec
from ..utils.vec import Vec3
from . import shade as shade_ops
from .intersect import intersect_scene
from .rays import PathState

import os

BLOCK_ROWS = int(os.environ.get("PTT_BLOCK_ROWS", "64"))  # rays/block = this * 128


def _const_material_params(static: SceneStatic, mid: jnp.ndarray):
    """Per-lane material parameters via a constant-folded select chain."""
    ms = static.material_consts
    f = jnp.float32

    def chain(get):
        out = jnp.full(mid.shape, get(ms[0]), f)
        for i in range(1, len(ms)):
            out = jnp.where(mid == i, f(get(ms[i])), out)
        return out

    albedo = Vec3(
        chain(lambda m: m.color[0]),
        chain(lambda m: m.color[1]),
        chain(lambda m: m.color[2]),
    )
    return (
        albedo,
        chain(lambda m: m.emittance),
        chain(lambda m: m.has_reflective),
        chain(lambda m: m.has_refractive),
        chain(lambda m: m.ior),
        chain(lambda m: m.roughness),
        chain(lambda m: m.metallic),
    )


def _bounce_kernel(
    static: SceneStatic,
    cfg: RenderConfig,
    # refs: inputs
    ox, oy, oz, dx, dy, dz, cr, cg, cb, bn,
    u0, u1, u2,
    # refs: outputs
    o_ox, o_oy, o_oz, o_dx, o_dy, o_dz, o_cr, o_cg, o_cb, o_bn,
):
    paths = PathState(
        origin=Vec3(ox[:], oy[:], oz[:]),
        direction=Vec3(dx[:], dy[:], dz[:]),
        color=Vec3(cr[:], cg[:], cb[:]),
        pixel=bn[:],  # placeholder; never read by scatter_compose
        bounces=bn[:],
    )
    isect = intersect_scene(None, static, paths, cfg)

    mid = jnp.clip(isect.material_id, 0, static.num_materials - 1)
    albedo, emitt, refl, refr, ior, rough, metal = _const_material_params(
        static, mid
    )
    out = shade_ops.scatter_compose(
        cfg,
        paths,
        isect,
        isect.normal,  # no bump maps in the fused path
        albedo,
        emitt,
        refl,
        refr,
        ior,
        rough,
        metal,
        (u0[:], u1[:], u2[:]),
        lobes=shade_ops.lobes_present(static),
    )
    o_ox[:] = out.origin.x
    o_oy[:] = out.origin.y
    o_oz[:] = out.origin.z
    o_dx[:] = out.direction.x
    o_dy[:] = out.direction.y
    o_dz[:] = out.direction.z
    o_cr[:] = out.color.x
    o_cg[:] = out.color.y
    o_cb[:] = out.color.z
    o_bn[:] = out.bounces


@functools.partial(
    jax.jit, static_argnames=("static", "cfg", "interpret")
)
def fused_prim_bounce(
    static: SceneStatic,
    cfg: RenderConfig,
    paths: PathState,
    uniforms: jnp.ndarray,  # [3, N]
    interpret: bool = False,
) -> PathState:
    n = paths.pixel.shape[0]
    block = BLOCK_ROWS * 128
    n_pad = ((n + block - 1) // block) * block

    def prep(x, fill=0):
        return jnp.pad(x, (0, n_pad - n), constant_values=fill).reshape(-1, 128)

    ins = [
        prep(paths.origin.x), prep(paths.origin.y), prep(paths.origin.z),
        prep(paths.direction.x), prep(paths.direction.y),
        prep(paths.direction.z, fill=1.0),  # padded rays: unit dir, 0 bounces
        prep(paths.color.x), prep(paths.color.y), prep(paths.color.z),
        prep(paths.bounces),
        prep(uniforms[0]), prep(uniforms[1]), prep(uniforms[2]),
    ]
    rows = n_pad // 128
    grid = (rows // BLOCK_ROWS,)
    bspec_f = pl.BlockSpec((BLOCK_ROWS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)

    kern = functools.partial(_bounce_kernel, static, cfg)
    shapes = [jax.ShapeDtypeStruct((rows, 128), jnp.float32)] * 9 + [
        jax.ShapeDtypeStruct((rows, 128), jnp.int32)
    ]
    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[bspec_f] * 13,
        out_specs=tuple([bspec_f] * 10),
        out_shape=tuple(shapes),
        interpret=interpret,
    )(*ins)

    unp = lambda x: x.reshape(-1)[:n]
    return PathState(
        origin=Vec3(unp(outs[0]), unp(outs[1]), unp(outs[2])),
        direction=Vec3(unp(outs[3]), unp(outs[4]), unp(outs[5])),
        color=Vec3(unp(outs[6]), unp(outs[7]), unp(outs[8])),
        pixel=paths.pixel,
        bounces=unp(outs[9]),
    )


def fused_applicable(static: SceneStatic, cfg: RenderConfig) -> bool:
    return (
        not static.has_triangles
        and static.num_textures == 0
        and cfg.shader == "full"
    )


# ---------------------------------------------------------------------------
# Fused MESH bounce: the mesh intersection itself runs in the MXU Pallas
# kernel (ops.intersect_mxu), but round-2 profiling showed the ~140 ms/frame
# of XLA around it (prim intersect, merge, shade, raygen uniforms) rivals the
# kernel cost -- the same HBM-intermediate tax the prim-only fused kernel
# eliminated.  So a mesh bounce becomes a 3-stage pipeline:
#
#   1. XLA:    prim nearest-t prepass (t_limit for mesh pruning),
#              coherence sort + MXU intersect kernel -> (t, tri),
#              one row-gather attr resolve + winner (u,v) + normal interp
#   2. Pallas: THIS kernel -- analytic prim intersect (constant-folded),
#              merge with the mesh hit, BSDF shade -- all VMEM-resident.
#
# Applicable when the scene has no textures (texture gathers can't lower in
# Mosaic); textured scenes keep the unfused path.
# ---------------------------------------------------------------------------


def _mesh_bounce_kernel(
    prim_static: SceneStatic,  # static with num_triangles=0 (prims only)
    cfg: RenderConfig,
    mode: str,  # "plain" | "textured" | "precomputed"
    # refs: inputs (mar/mag/mab present unless "plain")
    *refs,
):
    if mode in ("textured", "precomputed"):
        (ox, oy, oz, dx, dy, dz, cr, cg, cb, bn,
         mt, mnx, mny, mnz, mmat, mar, mag, mab,
         u0, u1, u2,
         o_ox, o_oy, o_oz, o_dx, o_dy, o_dz, o_cr, o_cg, o_cb, o_bn) = refs
    else:
        (ox, oy, oz, dx, dy, dz, cr, cg, cb, bn,
         mt, mnx, mny, mnz, mmat,
         u0, u1, u2,
         o_ox, o_oy, o_oz, o_dx, o_dy, o_dz, o_cr, o_cg, o_cb, o_bn) = refs
    paths = PathState(
        origin=Vec3(ox[:], oy[:], oz[:]),
        direction=Vec3(dx[:], dy[:], dz[:]),
        color=Vec3(cr[:], cg[:], cb[:]),
        pixel=bn[:],  # placeholder; never read by scatter_compose
        bounces=bn[:],
    )
    mesh_mat = mmat[:]
    mn = Vec3(mnx[:], mny[:], mnz[:])

    if mode == "precomputed":
        # The WHOLE surface (prims + mesh merge + texture/bump) was resolved
        # in XLA (textured-prim scenes: texture gathers can't lower in
        # Mosaic, and prim uv/tangents only exist post-intersection).  The
        # kernel is the scatter/BSDF stage only -- inputs are the final
        # (t, shading normal, material, albedo) per lane.
        from .rays import Intersections

        zero = jnp.zeros_like(mt[:])
        t = mt[:]
        normal = mn
        mat = mesh_mat
        isect_p = Intersections(
            t=t, normal=normal, material_id=mat, uv_u=zero, uv_v=zero,
            dpdu=Vec3(zero, zero, zero), dpdv=Vec3(zero, zero, zero),
            is_triangle=zero > 0.0,  # unused by scatter_compose
        )
    else:
        isect_p = intersect_scene(None, prim_static, paths, cfg)

        # Merge the precomputed mesh hit.  The MXU kernel ran with the prim
        # nearest t as its t_limit, so tri_hit already implies mesh-closer
        # (exact prim ties resolve to the prim, as in intersect_scene).
        tri_hit = mesh_mat >= 0
        if mode != "textured":
            # Textured mode passes the final mesh SHADING normal (already
            # oriented + bump-perturbed in the XLA surface stage).
            flip = vec.dot(paths.direction, mn) > 0.0
            mn = vec.where(flip, -mn, mn)

        t = jnp.where(tri_hit, mt[:], isect_p.t)
        normal = vec.where(tri_hit, mn, isect_p.normal)
        mat = jnp.where(tri_hit, mesh_mat, isect_p.material_id)

    mid = jnp.clip(mat, 0, prim_static.num_materials - 1)
    albedo, emitt, refl, refr, ior, rough, metal = _const_material_params(
        prim_static, mid
    )
    if mode == "textured":
        # Mesh lanes: texture-overridden albedo from the XLA surface stage.
        # Prim lanes keep const-chain albedo (the fused gate guarantees no
        # prim material has a texture or bump map).
        albedo = vec.where(tri_hit, Vec3(mar[:], mag[:], mab[:]), albedo)
    elif mode == "precomputed":
        # Every lane's albedo arrives fully resolved (base color + texture
        # override, prim and mesh uniformly -- src/pathtrace.cu:549-553).
        albedo = Vec3(mar[:], mag[:], mab[:])
    isect = isect_p._replace(t=t, normal=normal, material_id=mat)
    out = shade_ops.scatter_compose(
        cfg,
        paths,
        isect,
        normal,
        albedo, emitt, refl, refr, ior, rough, metal,
        (u0[:], u1[:], u2[:]),
        lobes=shade_ops.lobes_present(prim_static),
    )
    o_ox[:] = out.origin.x
    o_oy[:] = out.origin.y
    o_oz[:] = out.origin.z
    o_dx[:] = out.direction.x
    o_dy[:] = out.direction.y
    o_dz[:] = out.direction.z
    o_cr[:] = out.color.x
    o_cg[:] = out.color.y
    o_cb[:] = out.color.z
    o_bn[:] = out.bounces


@functools.partial(
    jax.jit, static_argnames=("prim_static", "cfg", "interpret", "mode")
)
def _fused_mesh_shade(
    prim_static: SceneStatic,
    cfg: RenderConfig,
    paths: PathState,
    mesh_t: jnp.ndarray,
    mesh_normal: Vec3,
    mesh_mat: jnp.ndarray,  # i32, -1 = no mesh hit
    uniforms: jnp.ndarray,  # [3, N]
    mesh_albedo: Vec3 = None,  # textured/precomputed: per-lane albedo
    interpret: bool = False,
    mode: str = None,  # None = infer plain/textured from mesh_albedo
) -> PathState:
    n = paths.pixel.shape[0]
    block = BLOCK_ROWS * 128
    n_pad = ((n + block - 1) // block) * block
    if mode is None:
        mode = "plain" if mesh_albedo is None else "textured"

    def prep(x, fill=0):
        return jnp.pad(x, (0, n_pad - n), constant_values=fill).reshape(-1, 128)

    ins = [
        prep(paths.origin.x), prep(paths.origin.y), prep(paths.origin.z),
        prep(paths.direction.x), prep(paths.direction.y),
        prep(paths.direction.z, fill=1.0),
        prep(paths.color.x), prep(paths.color.y), prep(paths.color.z),
        prep(paths.bounces),
        prep(mesh_t), prep(mesh_normal.x), prep(mesh_normal.y),
        prep(mesh_normal.z), prep(mesh_mat, fill=-1),
    ]
    if mode in ("textured", "precomputed"):
        ins += [prep(mesh_albedo.x), prep(mesh_albedo.y), prep(mesh_albedo.z)]
    ins += [prep(uniforms[0]), prep(uniforms[1]), prep(uniforms[2])]
    rows = n_pad // 128
    grid = (rows // BLOCK_ROWS,)
    bspec = pl.BlockSpec((BLOCK_ROWS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)

    kern = functools.partial(_mesh_bounce_kernel, prim_static, cfg, mode)
    shapes = [jax.ShapeDtypeStruct((rows, 128), jnp.float32)] * 9 + [
        jax.ShapeDtypeStruct((rows, 128), jnp.int32)
    ]
    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[bspec] * len(ins),
        out_specs=tuple([bspec] * 10),
        out_shape=tuple(shapes),
        interpret=interpret,
    )(*ins)

    unp = lambda x: x.reshape(-1)[:n]
    return PathState(
        origin=Vec3(unp(outs[0]), unp(outs[1]), unp(outs[2])),
        direction=Vec3(unp(outs[3]), unp(outs[4]), unp(outs[5])),
        color=Vec3(unp(outs[6]), unp(outs[7]), unp(outs[8])),
        pixel=paths.pixel,
        bounces=unp(outs[9]),
    )


def fused_mesh_applicable(static: SceneStatic, cfg: RenderConfig) -> bool:
    """The fused mesh bounce needs the MXU intersector.  Textured scenes are
    supported when the textures live on MESH materials only (texture/bump
    sampling then runs in the XLA surface stage between the MXU intersect
    and this kernel; reference behavior ``src/pathtrace.cu:505-519``).  A
    textured/bumped material on an analytic prim takes ``fused_tex_bounce``
    instead (prim uv/tangents only exist post-intersection, and texture
    gathers cannot lower in Mosaic, so the whole surface resolves in XLA
    and the kernel runs the scatter/BSDF stage)."""
    return (
        static.has_triangles
        and not (static.num_textures > 0 and static.prim_textured)
        and cfg.shader == "full"
        and cfg.bvh_acceleration
        and cfg.mesh_intersector in ("auto", "mxu")
    )


def fused_tex_applicable(static: SceneStatic, cfg: RenderConfig) -> bool:
    """Textured-PRIM scenes (with or without a mesh): full intersect +
    texture/bump surface resolve in XLA (shared verbatim with the unfused
    shade), scatter/BSDF in the Pallas kernel."""
    return (
        static.num_textures > 0
        and static.prim_textured
        and cfg.shader == "full"
    )


def tex_sort_active(cfg: RenderConfig) -> bool:
    """Whether the textured-prim fused path runs liveness-packed (and so
    prefix-tiered, and its film must scatter by pixel).  Unlike the mesh
    path -- where coherence sorting pays for itself through traversal culls
    -- a pure liveness sort here only buys the tier slicing, so it engages
    only when tiers are configured."""
    return bool(cfg.resolved_prefix_tiers()) and (
        cfg.ray_sorting == "on"
        or (cfg.ray_sorting == "auto" and jax.default_backend() != "cpu")
    )


def fused_tex_bounce(
    dev,
    static: SceneStatic,
    cfg: RenderConfig,
    paths: PathState,
    su_key: jax.Array,
    interpret: bool = False,
    rng_n: int = None,
    resort: bool = True,
) -> PathState:
    """One bounce for textured-prim scenes: ``intersect_scene`` (any
    intersector backend, incl. the internally-sorted MXU chain) and
    ``textured_surface`` run in XLA exactly as the unfused shade does
    (reference shades prim and mesh textures uniformly,
    ``src/pathtrace.cu:549-553``); the BSDF scatter stage -- the largest
    XLA-intermediate producer after intersection -- runs in the Pallas
    kernel (``mode="precomputed"``).

    With ``cfg.bounce_prefix_tiers`` set (and sorting enabled), the bounce
    runs liveness-packed: a stable alive-first permutation (pixel order
    preserved within each class, so texel locality is unchanged) packs every
    alive ray into a prefix and the whole stage chain -- intersect, texture
    resolve, the scatter kernel -- operates on the smallest configured tier
    holding the population, exactly as the fused mesh bounce does.  The sort
    runs WITHIN the engaged tier (rays past the tier are dead by the tier
    predicate), so its cost shrinks with the population.  Bit-identical to
    the unsorted bounce: every stage is elementwise per ray with pixel-keyed
    RNG, so only dead-row layout differs, which the by-pixel film scatter
    erases."""
    n = paths.pixel.shape[0]
    rng_n = rng_n or n
    sort_rays = tex_sort_active(cfg)
    npres = tier_sizes(n, cfg.resolved_prefix_tiers()) if sort_rays else []

    def body(head):
        if sort_rays and resort:
            head = _liveness_pack(head, max_id=rng_n)
        return _fused_tex_bounce_at(
            dev, static, cfg, head, su_key, interpret, rng_n
        )

    if not npres:
        return body(paths)
    return run_tiered(paths, npres, body)


def _liveness_pack(paths: PathState, max_id=None) -> PathState:
    """Stable alive-first permutation of the whole path state (one packed
    row gather; pixel order preserved within the alive / dead classes)."""
    n = paths.pixel.shape[0]
    perm = jnp.argsort(jnp.where(paths.alive, 0, 1).astype(jnp.int32))
    paths, _ = _permute_bounce_state(
        paths, jnp.zeros((n,), jnp.float32), perm, max_id=max_id
    )
    return paths


def _fused_tex_bounce_at(
    dev,
    static: SceneStatic,
    cfg: RenderConfig,
    paths: PathState,
    su_key: jax.Array,
    interpret: bool,
    rng_n: int,
) -> PathState:
    """The textured-prim bounce body (possibly over a prefix slice)."""
    import dataclasses

    uniforms = prng.uniforms_at(su_key, paths.pixel, 3, rng_n)
    isect = intersect_scene(dev, static, paths, cfg)
    mid = jnp.clip(isect.material_id, 0, static.num_materials - 1)
    base = vec.select_gather(dev.materials.color, mid)
    live = (paths.bounces > 0) & (isect.t > 0.0)
    albedo, shading_normal = shade_ops.textured_surface(
        dev, static, isect, mid, base, live=live
    )
    prim_static = dataclasses.replace(static, num_triangles=0)
    return _fused_mesh_shade(
        prim_static, cfg, paths, isect.t, shading_normal, isect.material_id,
        uniforms, mesh_albedo=albedo, interpret=interpret, mode="precomputed",
    )


def _permute_bounce_state(paths, t_lim, perm, max_id=None):
    """One packed [N, 12] row gather for the persistent sort: the shared
    packed-permute (``ops.compaction.permute_path_state``) with t_lim
    riding as the extra f32 column -- exactly the wavefront compaction's
    gather plus one column, so the subtle int-ride-along rules live in one
    place."""
    from .compaction import permute_path_state

    paths, (t_lim,) = permute_path_state(
        paths, perm, extra=(t_lim,), max_id=max_id
    )
    return paths, t_lim


def fused_mesh_bounce(
    dev,
    static: SceneStatic,
    cfg: RenderConfig,
    paths: PathState,
    uniforms: jnp.ndarray = None,  # [3, N] pixel-order planes (su_key=None)
    interpret: bool = False,
    resort: bool = True,
    su_key: jax.Array = None,  # stage key: draw per-pixel uniforms in place
    rng_n: int = None,  # global pixel count for the RNG stream (shard_map:
    #                     the local block draws from the GLOBAL stream)
) -> PathState:
    """One full mesh-scene bounce: prim-t prepass + sorted MXU intersect +
    attr resolve/interp (XLA) + the fused prim-intersect/merge/shade kernel.

    With ``cfg.bounce_prefix_tiers`` set, the ENTIRE bounce runs over a
    static prefix of the ray state: the persistent coherence sort (3-level
    key: live&root < live&prim-only < dead) packs every alive ray into the
    previous bounce's alive prefix, so a ``lax.cond`` chain picks the
    smallest configured tier holding every alive ray and all per-bounce
    stages -- prim prepass, sort key + argsort, permutation apply, RNG,
    the MXU intersect, attr resolve, the fused shade kernel -- operate on
    ``[:n/div]`` rows while the dead tail passes through untouched.  Images
    are bit-identical to the untiered bounce: every stage is elementwise
    per ray with pixel-keyed RNG, so only dead-row LAYOUT differs, which
    the by-pixel film scatter erases."""
    sort_rays = cfg.ray_sorting == "on" or (
        cfg.ray_sorting == "auto" and jax.default_backend() != "cpu"
    )
    n = paths.pixel.shape[0]
    rng_n = rng_n or n
    from . import intersect_mxu

    tiers = cfg.resolved_prefix_tiers() if sort_rays else ()
    npres = tier_sizes(n, tiers)
    # Bounce tiers COMPOSE with the binned traversal now that the pair
    # budget is anchored to the unsliced ray count (budget_anchor_n): the
    # round-3 "tiers+binned" regression (952 vs 659 ms at 200k) was the
    # slice-local budget overflowing on mid bounces and silently falling
    # back to the streamed walk every frame.
    body = lambda head: _fused_mesh_bounce_at(
        dev, static, cfg, head, uniforms, interpret, resort, su_key,
        rng_n, sort_rays, budget_anchor_n=n,
    )
    if not npres:
        return body(paths)
    return run_tiered(paths, npres, body)


def tier_sizes(n: int, tiers) -> list:
    """Prefix-tier row counts for an n-ray state: each configured divisor d
    yields an n/d prefix rounded UP to intersect-block units (256 rows --
    every kernel pads internally so any multiple works, and 256 keeps tiers
    engageable at test-sized ray counts)."""
    npres = []
    unit = 256
    for div in sorted({int(d) for d in tiers}, reverse=True):
        npre = min(n, ((n // max(1, div) + unit - 1) // unit) * unit)
        if 0 < npre < n and npre not in npres:
            npres.append(npre)
    return npres


def run_tiered(paths: PathState, npres: list, body) -> PathState:
    """Run ``body`` (a whole-bounce function PathState -> PathState) over the
    smallest configured prefix holding every alive ray: a ``lax.cond`` chain
    tests the last alive position (rays are liveness-packed by the caller's
    persistent sort) and the dead tail passes through untouched.  Falls back
    to the full state when the population exceeds every tier."""
    n = paths.pixel.shape[0]
    live_pos = jnp.max(
        jnp.where(paths.alive, jax.lax.iota(jnp.int32, n), -1)
    )
    tmap = jax.tree_util.tree_map

    def tier_at(npre):
        def branch(_):
            head = tmap(lambda a: a[:npre], paths)
            out = body(head)
            tail = tmap(lambda a: a[npre:], paths)
            return tmap(
                lambda a, b: jnp.concatenate([a, b], axis=0), out, tail
            )

        return branch

    chain = lambda _: body(paths)
    for npre in reversed(sorted(npres)):
        chain = (
            lambda _, npre=npre, nxt=chain: jax.lax.cond(
                live_pos < npre, tier_at(npre), nxt, None
            )
        )
    return chain(None)


def _fused_mesh_bounce_at(
    dev,
    static: SceneStatic,
    cfg: RenderConfig,
    paths: PathState,
    uniforms: jnp.ndarray,
    interpret: bool,
    resort: bool,
    su_key: jax.Array,
    rng_n: int,
    sort_rays: bool,
    budget_anchor_n: int = None,
) -> PathState:
    """The bounce body (possibly over a prefix slice of the ray state)."""
    import dataclasses

    from . import intersect_mxu
    from .intersect import prim_t_min

    t_lim = prim_t_min(static, cfg, paths.origin, paths.direction)

    if sort_rays and resort:
        mode = "signature" if cfg.ray_sort_mode == "auto" else cfg.ray_sort_mode
        perm = intersect_mxu.coherence_perm(
            dev.mxu_mesh, paths.origin, paths.direction, paths.alive,
            t_lim, cfg.ray_sort_bits, cfg.ray_sort_dir_bits, mode=mode,
        )
        paths, t_lim = _permute_bounce_state(paths, t_lim, perm, max_id=rng_n)
    if su_key is not None:
        # Per-pixel RNG evaluated IN PLACE at each slot's pixel id (a slot's
        # random stream follows its PIXEL, so any permutation history is
        # invisible): elementwise threefry, no gather.  rng_n is the GLOBAL
        # stream length (resolved before any prefix slicing).
        uniforms = prng.uniforms_at(su_key, paths.pixel, 3, rng_n)
    elif sort_rays:
        # Pixel-order planes were passed: route them through the (possibly
        # historical) permutation with one [N, 3] row gather.
        su = jnp.stack([uniforms[0], uniforms[1], uniforms[2]], axis=1)
        su = su[paths.pixel]
        uniforms = jnp.stack([su[:, 0], su[:, 1], su[:, 2]])

    ro, rd = paths.origin, paths.direction
    mh = intersect_mxu.mesh_intersect_mxu(
        dev.mxu_mesh,
        static.num_triangles,
        static.mxu_padded_tris,
        ro, rd, paths.alive, t_lim,
        cfg.baby_epsilon,
        sort_rays=False,  # persistent: state is already in sorted order
        mesh_bounds=static.mesh_bounds,
        interpret=interpret,
        compute_uv=False,
        **intersect_mxu.traversal_flags(
            cfg.mxu_traversal, static.mxu_padded_tris,
            binned_tiers=cfg.mxu_binned_tiers,
            binned_budget_rays=budget_anchor_n,
        ),
    )
    textured = static.num_textures > 0
    tri_hit = mh.tri >= 0
    if not textured:
        at = intersect_mxu.resolve_shade_attributes(
            dev.mxu_mesh, static.mxu_padded_tris, mh.tri
        )
        uu, vv = intersect_mxu.winner_uv_from_geom(
            at[:, 10:13], at[:, 13:16], at[:, 16:19], mh.tri, ro, rd,
            cfg.baby_epsilon,
        )
        w = 1.0 - uu - vv
        n0 = Vec3(at[:, 0], at[:, 1], at[:, 2])
        n1 = Vec3(at[:, 3], at[:, 4], at[:, 5])
        n2 = Vec3(at[:, 6], at[:, 7], at[:, 8])
        mesh_normal = vec.normalize(n0 * w + n1 * uu + n2 * vv)
        # Miss rows are all-zero -> normalize would NaN; mask them out.
        mesh_normal = vec.where(tri_hit, mesh_normal, Vec3.zeros(uu.shape))
        mesh_mat = jnp.where(tri_hit, at[:, 9].astype(jnp.int32), -1)
        mesh_albedo = None
    else:
        # Textured mesh surface stage (XLA): full attr rows, interpolated
        # uv, texture albedo override + bump shading normal via the SAME
        # helper the unfused shade uses (ops.shade.textured_surface).
        at = intersect_mxu.resolve_attributes(
            dev.mxu_mesh, static.mxu_padded_tris, mh.tri,
            mode=cfg.mxu_attr_resolve,
        )
        uu, vv = intersect_mxu.winner_uv_from_geom(
            at[:, 24:27], at[:, 27:30], at[:, 30:33], mh.tri, ro, rd,
            cfg.baby_epsilon,
        )
        w = 1.0 - uu - vv
        n0 = Vec3(at[:, 0], at[:, 1], at[:, 2])
        n1 = Vec3(at[:, 3], at[:, 4], at[:, 5])
        n2 = Vec3(at[:, 6], at[:, 7], at[:, 8])
        ng = vec.normalize(n0 * w + n1 * uu + n2 * vv)
        ng = vec.where(tri_hit, ng, Vec3.zeros(uu.shape))
        # Orient toward the ray (the in-kernel merge rule), BEFORE bump --
        # matching the unfused path where isect.normal arrives oriented.
        ng = vec.where(vec.dot(rd, ng) > 0.0, -ng, ng)
        mesh_mat = jnp.where(tri_hit, at[:, 21].astype(jnp.int32), -1)
        uv_u = at[:, 9] * w + at[:, 11] * uu + at[:, 13] * vv
        uv_v = at[:, 10] * w + at[:, 12] * uu + at[:, 14] * vv
        from .rays import Intersections

        isect_m = Intersections(
            t=mh.t,
            normal=ng,
            material_id=mesh_mat,
            uv_u=uv_u,
            uv_v=uv_v,
            dpdu=Vec3(at[:, 15], at[:, 16], at[:, 17]),
            dpdv=Vec3(at[:, 18], at[:, 19], at[:, 20]),
            is_triangle=tri_hit,
        )
        mid_m = jnp.clip(mesh_mat, 0, static.num_materials - 1)
        base = vec.select_gather(dev.materials.color, mid_m)
        mesh_albedo, mesh_normal = shade_ops.textured_surface(
            dev, static, isect_m, mid_m, base,
            live=tri_hit & paths.alive,
        )
        mesh_normal = vec.where(tri_hit, mesh_normal, Vec3.zeros(uu.shape))

    prim_static = dataclasses.replace(static, num_triangles=0)
    return _fused_mesh_shade(
        prim_static, cfg, paths, mh.t, mesh_normal, mesh_mat, uniforms,
        mesh_albedo=mesh_albedo,
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# Whole-iteration fusion: raygen + depth x (intersect + shade) + film
# accumulate in ONE Pallas program.  Depth-profiling showed the per-bounce
# kernel leaves ~2 ms/frame of fixed cost (raygen, film, per-dispatch
# overhead inside the spp fori_loop); this removes all of it.  The camera is
# baked as static floats (the reference also rebuilds everything on camera
# change, src/main.cpp:449-453).
# ---------------------------------------------------------------------------


def _iteration_kernel(
    static: SceneStatic,
    cfg: RenderConfig,
    cam: tuple,  # static floats, see camera_statics()
    n_real: int,
    # refs: film in (3), uniforms [4 + 3*depth] planes
    fr_in, fg_in, fb_in,
    *rest,
):
    depth = static.trace_depth
    n_u = 4 + 3 * depth
    u = rest[:n_u]
    fr_out, fg_out, fb_out, alive_out = rest[n_u:]

    (posx, posy, posz, vx, vy, vz, ux, uy, uz, rx, ry, rz,
     plx, ply, aperture, focal) = cam
    width = static.width

    i = pl.program_id(0)
    row = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_ROWS, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_ROWS, 128), 1)
    idx = (i * BLOCK_ROWS + row) * 128 + lane
    in_range = idx < n_real

    # --- raygen (generateRayFromCamera parity; see ops/camera.py) ---------
    x = (idx % width).astype(jnp.float32)
    y = (idx // width).astype(jnp.float32)
    sx = plx * (x + u[0][:] - width * 0.5)
    sy = ply * (y + u[1][:] - static.height * 0.5)
    pp = Vec3(vx - rx * sx - ux * sy, vy - ry * sx - uy * sy, vz - rz * sx - uz * sy)
    rdir = vec.normalize(pp)
    position = Vec3.from_scalar(posx, posy, posz)
    focal_pt = position + rdir * focal
    r = aperture * jnp.sqrt(u[2][:])
    theta = 6.283185307179586 * u[3][:]
    origin = Vec3(posx + r * jnp.cos(theta), posy + r * jnp.sin(theta),
                  jnp.full(idx.shape, posz, jnp.float32))
    direction = vec.normalize(focal_pt - origin)

    one = jnp.ones(idx.shape, jnp.float32)
    paths = PathState(
        origin=origin,
        direction=direction,
        color=Vec3(one, one, one),
        pixel=idx,
        bounces=jnp.where(in_range, depth, 0).astype(jnp.int32),
    )

    lobes = shade_ops.lobes_present(static)
    counts = []
    for d in range(depth):
        isect = intersect_scene(None, static, paths, cfg)
        mid = jnp.clip(isect.material_id, 0, static.num_materials - 1)
        albedo, emitt, refl, refr, ior, rough, metal = _const_material_params(
            static, mid
        )
        paths = shade_ops.scatter_compose(
            cfg, paths, isect, isect.normal,
            albedo, emitt, refl, refr, ior, rough, metal,
            (u[4 + 3 * d][:], u[5 + 3 * d][:], u[6 + 3 * d][:]),
            lobes=lobes,
        )
        counts.append(jnp.sum((paths.bounces > 0).astype(jnp.int32)))

    # --- film accumulate (finalGather parity; padded lanes masked) --------
    mask = in_range.astype(jnp.float32)
    fr_out[:] = fr_in[:] + paths.color.x * mask
    fg_out[:] = fg_in[:] + paths.color.y * mask
    fb_out[:] = fb_in[:] + paths.color.z * mask
    # (8, 128) tile to satisfy the min sublane tiling; data in row 0 only.
    # Built with iota masks -- Mosaic has no scatter.
    rows8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    lanes8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    block_counts = jnp.zeros((8, 128), jnp.int32)
    for d, cnt in enumerate(counts):
        block_counts = block_counts + jnp.where(
            (rows8 == 0) & (lanes8 == d), cnt, 0
        )
    alive_out[:] = block_counts


def camera_statics(cam_state) -> tuple:
    """CameraState (dynamic arrays) -> hashable static float tuple."""
    import numpy as np

    f = lambda a: float(np.asarray(a))
    return (
        f(cam_state.position[0]), f(cam_state.position[1]), f(cam_state.position[2]),
        f(cam_state.view[0]), f(cam_state.view[1]), f(cam_state.view[2]),
        f(cam_state.up[0]), f(cam_state.up[1]), f(cam_state.up[2]),
        f(cam_state.right[0]), f(cam_state.right[1]), f(cam_state.right[2]),
        f(cam_state.pixel_length[0]), f(cam_state.pixel_length[1]),
        f(cam_state.aperture), f(cam_state.focal_dist),
    )


@functools.partial(
    jax.jit, static_argnames=("static", "cfg", "cam", "interpret")
)
def fused_prim_iteration(
    static: SceneStatic,
    cfg: RenderConfig,
    cam: tuple,
    film,  # Vec3 of [N]
    uniform_planes,  # tuple of [N] arrays: 4 camera + 3*depth shade planes
    interpret: bool = False,
):
    """One full spp iteration in a single Pallas program.

    Returns (film', alive_counts[depth])."""
    n = film.x.shape[0]
    block = BLOCK_ROWS * 128
    n_pad = ((n + block - 1) // block) * block

    def prep(x):
        return jnp.pad(x, (0, n_pad - n)).reshape(-1, 128)

    ins = [prep(film.x), prep(film.y), prep(film.z)] + [
        prep(p) for p in uniform_planes
    ]
    rows = n_pad // 128
    grid = (rows // BLOCK_ROWS,)
    bspec = pl.BlockSpec((BLOCK_ROWS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)

    kern = functools.partial(_iteration_kernel, static, cfg, cam, n)
    n_blocks = grid[0]
    fr, fg, fb, alive = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[bspec] * len(ins),
        out_specs=(bspec, bspec, bspec, cspec),
        out_shape=(
            jax.ShapeDtypeStruct((rows, 128), jnp.float32),
            jax.ShapeDtypeStruct((rows, 128), jnp.float32),
            jax.ShapeDtypeStruct((rows, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks * 8, 128), jnp.int32),
        ),
        interpret=interpret,
    )(*ins)

    unp = lambda a: a.reshape(-1)[:n]
    film_out = Vec3(unp(fr), unp(fg), unp(fb))
    alive_counts = jnp.sum(alive, axis=0)[: static.trace_depth]
    return film_out, alive_counts
