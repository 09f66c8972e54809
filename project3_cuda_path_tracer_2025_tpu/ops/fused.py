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
from ..utils.vec import Vec3
from . import shade as shade_ops
from .intersect import intersect_scene
from .rays import PathState

BLOCK_ROWS = 64  # rays per block = BLOCK_ROWS * 128


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
