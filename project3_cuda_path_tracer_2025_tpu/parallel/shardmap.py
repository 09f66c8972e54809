"""Multi-chip rendering as ``shard_map`` over the ray axis (production path).

``parallel.mesh.sharded_iteration`` relies on XLA's automatic partitioner,
which cannot split custom calls -- the Pallas production kernels (fused
bounce, MXU intersector) would be replicated or rejected on a real multi-chip
mesh.  This module is the TPU-idiomatic formulation instead: the whole
iteration body runs INSIDE ``jax.shard_map``, so every chip executes the
full single-chip program (including all Pallas kernels) on its local
pixel block with local shapes, and the only collective in the entire
iteration is one tiny ``psum`` of the per-depth alive counts.

Two modes (both bit-identical to single-chip, asserted in tests):

* ``pixel``  -- the N = W*H path slots are block-sharded across chips; each
  chip renders its own pixel rows every iteration.  RNG stays bit-identical
  because every draw is ``prng.uniforms_at`` at GLOBAL (pixel, depth)
  counters -- a chip evaluates exactly the slice of the global stream its
  pixels own, so film(pixel-parallel, nd chips) == film(single chip), bit
  for bit.
* ``sample`` -- every chip renders the FULL frame at a different iteration
  number (chip d of nd renders iterations d+1, d+1+nd, ...); the per-chip
  films are summed on save.  nd chips advance the accumulator nd samples
  per step: film(sample-parallel, one step) == film(single chip, nd steps).

The scene tables are replicated (every chip traverses the same read-only
geometry); there is no cross-chip traffic per bounce -- by construction,
not by compiler luck.  SURVEY.md section 2.3: the reference is single-GPU;
this is the scale-out the CUDA architecture never had.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import RenderConfig
from ..models.megakernel import megakernel_iteration
from ..models.wavefront import wavefront_iteration
from ..scene.device import DeviceScene, SceneStatic
from ..utils.vec import Vec3
from .mesh import make_pixel_mesh

AXIS = "rays"


def _iter_fn(cfg: RenderConfig):
    return (
        wavefront_iteration
        if cfg.integrator == "wavefront"
        else megakernel_iteration
    )


def sharded_film(static: SceneStatic, mesh: Mesh, mode: str) -> Vec3:
    """Fresh film with the layout the sharded step expects."""
    nd = mesh.devices.size
    if mode == "sample":
        # one full-frame accumulator row per chip, summed at save
        z = jnp.zeros((nd, static.pixel_count), jnp.float32)
        sh = NamedSharding(mesh, P(AXIS, None))
    else:
        z = jnp.zeros((static.pixel_count,), jnp.float32)
        sh = NamedSharding(mesh, P(AXIS))
    put = lambda x: jax.device_put(x, sh)
    return Vec3(put(z), put(z), put(z))


def make_sharded_step(
    dev: DeviceScene,
    static: SceneStatic,
    cfg: RenderConfig,
    mesh: Mesh,
    mode: str = "pixel",
):
    """Build the multi-chip step(cam, film, iteration, key).

    Returns (jitted_step, traceable_step, spp_per_step): ``traceable_step``
    is the unjitted callable for embedding in a fori_loop (Renderer's
    ``step_many``); ``sample`` mode advances mesh-size samples per call
    (``iteration`` is the LAST global sample the call completes), ``pixel``
    mode advances 1.
    """
    nd = mesh.devices.size
    n = static.pixel_count
    iter_fn = _iter_fn(cfg)

    if mode == "pixel":
        if n % nd:
            raise ValueError(
                f"pixel-parallel mode needs devices | pixels ({nd} vs {n}); "
                "use parallel_mode='sample' for odd resolutions"
            )
        idx_global = jnp.arange(n, dtype=jnp.int32)

        def local(dev_l, cam, film, idx, iteration, key):
            f, alive = iter_fn(
                dev_l, static, cfg, cam, film, iteration, key,
                shard=(idx, n),
            )
            return f, jax.lax.psum(alive, AXIS)

        inner = jax.shard_map(
            local,
            mesh=mesh,
            # P() as a pytree prefix replicates the whole subtree (scene
            # tables, camera, scalars); per-ray arrays shard on the ray axis.
            in_specs=(P(), P(), P(AXIS), P(AXIS), P(), P()),
            out_specs=(P(AXIS), P()),
            check_vma=False,
        )

        def step(cam, film, iteration, key):
            return inner(dev, cam, film, idx_global, iteration, key)

        return jax.jit(step, donate_argnums=(1,)), step, 1

    if mode != "sample":
        raise ValueError(f"unknown parallel_mode {mode!r}")

    def local_sample(dev_l, cam, film_row, iteration, key):
        # iteration is the LAST global sample this step will complete; chip
        # d renders global iteration (iteration - nd + 1 + d) -- together
        # the step advances the film by exactly nd samples.
        d = jax.lax.axis_index(AXIS)
        it = iteration - nd + 1 + d
        film_l = Vec3(film_row.x[0], film_row.y[0], film_row.z[0])
        f, alive = iter_fn(dev_l, static, cfg, cam, film_l, it, key)
        f = Vec3(f.x[None], f.y[None], f.z[None])
        return f, jax.lax.psum(alive, AXIS)

    inner = jax.shard_map(
        local_sample,
        mesh=mesh,
        in_specs=(P(), P(), P(AXIS, None), P(), P()),
        out_specs=(P(AXIS, None), P()),
        check_vma=False,
    )

    def step(cam, film, iteration, key):
        return inner(dev, cam, film, iteration, key)

    return jax.jit(step, donate_argnums=(1,)), step, nd


def film_to_flat(film: Vec3, mode: str) -> Vec3:
    """Collapse the sharded film to the single-chip [N] layout (save time:
    the only cross-chip data movement in the whole pipeline)."""
    if mode == "sample":
        return Vec3(
            jnp.sum(film.x, axis=0), jnp.sum(film.y, axis=0),
            jnp.sum(film.z, axis=0),
        )
    return film
