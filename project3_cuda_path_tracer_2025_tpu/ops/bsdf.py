"""BSDF sampling library.

Exact-math parity with ``src/interactions.cu`` / ``src/interactions.h``:
cosine-weighted diffuse via concentric disk (``squareToDiskConcentric``
``:49-75``, ``squareToHemisphereCosine`` ``:77-81``), perfect mirror
(``:111-118``), specular transmission with glm::refract + TIR sentinel
(``:146-168``), Fresnel-dielectric glass (``:173-235``), and Cook-Torrance
GGX/Trowbridge-Reitz microfacet (``:238-435``).

Every function is a pure dense vector op over [N] lanes; the per-material
*selection* happens in ``ops.shade``.  All sampling math and epsilons match
the reference so images agree statistically at equal spp.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..utils import vec
from ..utils.mathutil import (
    INV_PI,
    PI,
    PI_OVER_FOUR,
    PI_OVER_TWO,
    TWO_PI,
)
from ..utils.vec import Vec3


# ---------------------------------------------------------------------------
# Local frame (interactions.h:14-32)
# ---------------------------------------------------------------------------

def coordinate_system(n: Vec3) -> tuple[Vec3, Vec3]:
    """Tangent/bitangent basis from a normal (interactions.h:14-20)."""
    use_x = jnp.abs(n.x) > jnp.abs(n.y)
    inv_a = 1.0 / jnp.sqrt(jnp.where(use_x, n.x * n.x + n.z * n.z, n.y * n.y + n.z * n.z))
    tan = Vec3(
        jnp.where(use_x, -n.z * inv_a, jnp.zeros_like(n.x)),
        jnp.where(use_x, jnp.zeros_like(n.x), n.z * inv_a),
        jnp.where(use_x, n.x * inv_a, -n.y * inv_a),
    )
    bit = vec.cross(n, tan)
    return tan, bit


def local_to_world(n: Vec3, w_local: Vec3) -> Vec3:
    """mat3(tan, bit, nor) * w (interactions.h:22-27)."""
    tan, bit = coordinate_system(n)
    return tan * w_local.x + bit * w_local.y + n * w_local.z


def world_to_local(n: Vec3, w_world: Vec3) -> Vec3:
    """Transpose of local_to_world (interactions.h:30-32)."""
    tan, bit = coordinate_system(n)
    return Vec3(vec.dot(tan, w_world), vec.dot(bit, w_world), vec.dot(n, w_world))


# ---------------------------------------------------------------------------
# Warping (interactions.cu:49-85)
# ---------------------------------------------------------------------------

def square_to_disk_concentric(xi0, xi1) -> tuple[jnp.ndarray, jnp.ndarray]:
    a = 2.0 * xi0 - 1.0
    b = 2.0 * xi1 - 1.0
    a_wins = (a * a) > (b * b)
    safe_a = jnp.where(a == 0.0, 1.0, a)
    safe_b = jnp.where(b == 0.0, 1.0, b)
    radius = jnp.where(a_wins, a, b)
    theta = jnp.where(
        a_wins,
        PI_OVER_FOUR * (b / safe_a),
        PI_OVER_TWO - PI_OVER_FOUR * (a / safe_b),
    )
    # Degenerate center: reference guards xi == (0,0); we additionally guard
    # a == b == 0 (where the reference's b/a would be 0/0 -> NaN, a
    # measure-zero input) to keep the film finite.
    center = (a == 0.0) & (b == 0.0)
    x = jnp.where(center, 0.0, radius * jnp.cos(theta))
    y = jnp.where(center, 0.0, radius * jnp.sin(theta))
    return x, y


def square_to_hemisphere_cosine(xi0, xi1) -> Vec3:
    dx, dy = square_to_disk_concentric(xi0, xi1)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - dx * dx - dy * dy))
    return Vec3(dx, dy, z)


def hemisphere_cosine_pdf(w_local: Vec3) -> jnp.ndarray:
    return w_local.z / PI


# ---------------------------------------------------------------------------
# Fresnel (interactions.cu:173-201)
# ---------------------------------------------------------------------------

def fresnel_dielectric_eval(cos_theta_i, ior):
    """FresnelDielectricEval (interactions.cu:173-194)."""
    cos_i = jnp.clip(cos_theta_i, -1.0, 1.0)
    swap = cos_i > 0.0
    eta_i = jnp.where(swap, ior, 1.0)
    eta_t = jnp.where(swap, 1.0, ior)
    cos_i = jnp.abs(cos_i)

    sin_i = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_i * cos_i))
    sin_t = eta_i / eta_t * sin_i
    cos_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin_t * sin_t))
    r_parl = (eta_t * cos_i - eta_i * cos_t) / (eta_t * cos_i + eta_i * cos_t)
    r_perp = (eta_i * cos_i - eta_t * cos_t) / (eta_i * cos_i + eta_t * cos_t)
    return (r_parl * r_parl + r_perp * r_perp) * 0.5


def fresnel_schlick(cos_theta, f0: Vec3) -> Vec3:
    """F0 + (1 - F0) * (1 - cos)^5 (interactions.cu:197-201)."""
    p = (1.0 - cos_theta) ** 5
    return f0 + (1.0 - f0) * p


# ---------------------------------------------------------------------------
# Lobe samplers. Each returns what scatterRay needs to apply the bounce.
# ---------------------------------------------------------------------------

class LobeSample(NamedTuple):
    wi: Vec3  # new world direction (normalized by the caller, as scatterRay does)
    f: Vec3  # bsdf value (meaning varies by lobe, as in the reference)
    pdf: jnp.ndarray


def sample_f_diffuse(albedo: Vec3, normal: Vec3, xi0, xi1) -> LobeSample:
    """sampleFDiffuse (interactions.cu:92-108)."""
    wi_local = square_to_hemisphere_cosine(xi0, xi1)
    wi = vec.normalize(local_to_world(normal, wi_local))
    pdf = hemisphere_cosine_pdf(wi_local)
    return LobeSample(wi=wi, f=albedo * INV_PI, pdf=pdf)


def sample_f_specular_reflection(albedo: Vec3, normal: Vec3, wo: Vec3) -> LobeSample:
    """sampleFSpecularRefl (interactions.cu:111-118); wo = incoming ray dir."""
    wi = vec.reflect(wo, normal)
    return LobeSample(wi=wi, f=albedo, pdf=jnp.ones_like(wi.x))


def sample_f_specular_transmission(
    albedo: Vec3, normal: Vec3, wo: Vec3, ior, baby_eps: float
) -> tuple[LobeSample, jnp.ndarray]:
    """sampleFSpecularTrans (interactions.cu:146-168).

    Returns (sample, tir_mask); on TIR the reference reflects and returns a
    BLACK bsdf (vec3(0)).
    """
    entering = vec.dot(wo, normal) < 0.0
    eta = jnp.where(entering, 1.0 / ior, ior)
    out_normal = vec.where(entering, normal, -normal)
    wt = vec.refract(vec.normalize(wo), vec.normalize(out_normal), eta)
    tir = vec.length(wt) < baby_eps
    wi = vec.where(tir, vec.reflect(wo, normal), wt)
    zero = Vec3.zeros(wi.x.shape)
    f = vec.where(tir, zero, albedo)
    return LobeSample(wi=wi, f=f, pdf=jnp.ones_like(wi.x)), tir


def sample_f_glass(
    albedo: Vec3, normal: Vec3, wo: Vec3, ior, u_choice, baby_eps: float
) -> LobeSample:
    """sampleFGlass (interactions.cu:204-235): Fresnel Russian-roulette
    between mirror reflection and transmission; TIR also reflects.  The
    returned bsdf is albedo in every branch."""
    cos_theta = vec.dot(wo, normal)
    fresnel = fresnel_dielectric_eval(cos_theta, ior)
    trans, tir = sample_f_specular_transmission(albedo, normal, wo, ior, baby_eps)
    reflect_mask = (u_choice < fresnel) | tir
    wi = vec.where(reflect_mask, vec.reflect(wo, normal), trans.wi)
    return LobeSample(wi=wi, f=albedo, pdf=jnp.ones_like(wi.x))


# ---------------------------------------------------------------------------
# Cook-Torrance microfacet (interactions.cu:238-435)
# ---------------------------------------------------------------------------

def _trowbridge_reitz_d(wh: Vec3, roughness) -> jnp.ndarray:
    """TrowbridgeReitzD (interactions.cu:266-281); isotropic so the Cos2Phi /
    Sin2Phi terms collapse to tan2/roughness^2."""
    cos2 = wh.z * wh.z
    sin2 = jnp.maximum(0.0, 1.0 - cos2)
    # tan2 = sin2/cos2; cos2 == 0 -> inf -> reference returns 0.
    safe_cos2 = jnp.where(cos2 == 0.0, 1.0, cos2)
    tan2 = sin2 / safe_cos2
    cos4 = cos2 * cos2
    r2 = roughness * roughness
    e = tan2 / r2
    d = 1.0 / (PI * r2 * cos4 * (1.0 + e) * (1.0 + e))
    return jnp.where(cos2 == 0.0, 0.0, d)


def _lambda(w: Vec3, roughness) -> jnp.ndarray:
    """lambda (interactions.cu:283-295)."""
    cos2 = w.z * w.z
    sin2 = jnp.maximum(0.0, 1.0 - cos2)
    safe_cos = jnp.where(cos2 == 0.0, 1.0, jnp.abs(w.z))
    abs_tan = jnp.sqrt(sin2) / safe_cos
    a2t2 = (roughness * abs_tan) ** 2
    lam = (-1.0 + jnp.sqrt(1.0 + a2t2)) / 2.0
    return jnp.where(cos2 == 0.0, 0.0, lam)  # isinf(tan) -> 0


def _trowbridge_reitz_g(wo: Vec3, wi: Vec3, roughness) -> jnp.ndarray:
    return 1.0 / (1.0 + _lambda(wo, roughness) + _lambda(wi, roughness))


def _sample_wh(wo_local: Vec3, roughness, xi0, xi1) -> Vec3:
    """sampleWH (interactions.cu:238-264)."""
    phi = TWO_PI * xi1
    denom = jnp.maximum(1.0 - xi0, 1e-12)
    tan2 = roughness * roughness * xi0 / denom
    cos_t = 1.0 / jnp.sqrt(1.0 + tan2)
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    wh = Vec3(sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t)
    same_hemi = (wo_local.z * wh.z) > 0.0
    return vec.where(same_hemi, wh, -wh)


def _f_microfacet_refl(
    albedo: Vec3, wo: Vec3, wi: Vec3, roughness, metallic
) -> Vec3:
    """fMicrofacetRefl (interactions.cu:314-348); all in the local frame."""
    cos_o = jnp.abs(wo.z)
    cos_i = jnp.abs(wi.z)
    wh = wi + wo
    wh_len = vec.length(wh)
    degenerate = (cos_i == 0.0) | (cos_o == 0.0) | (wh_len == 0.0)
    wh = wh / jnp.where(wh_len == 0.0, 1.0, wh_len)

    f0 = vec.lerp(Vec3.from_scalar(0.04, 0.04, 0.04), albedo, metallic)
    f = fresnel_schlick(vec.dot(wi, wh), f0)
    d = _trowbridge_reitz_d(wh, roughness)
    g = _trowbridge_reitz_g(wo, wi, roughness)
    denom = jnp.where(degenerate, 1.0, 4.0 * cos_i * cos_o)
    spec = f * (d * g / denom)
    zero = Vec3.zeros(wo.x.shape)
    return vec.where(degenerate, zero, spec)


def sample_f_cook_torrance(
    albedo: Vec3,
    normal: Vec3,
    wo_world: Vec3,  # -ray.direction, normalized
    roughness,
    metallic,
    u_choice,
    xi0,
    xi1,
) -> LobeSample:
    """sampleFCookTorrance (interactions.cu:383-435): Fresnel-weighted lobe
    choice between the GGX specular lobe and cosine diffuse."""
    f0 = vec.lerp(Vec3.from_scalar(0.04, 0.04, 0.04), albedo, metallic)
    cos_theta = jnp.clip(vec.dot(normal, wo_world), 0.0, 1.0)
    f = fresnel_schlick(cos_theta, f0)
    f_prob = jnp.clip(vec.max_component(f), 0.0, 1.0)
    choose_spec = u_choice < f_prob

    # --- specular lobe (sampleFMicrofacetRefl, interactions.cu:350-380) ----
    wo_local = world_to_local(normal, wo_world)
    wh = _sample_wh(wo_local, roughness, xi0, xi1)
    wh = vec.where(wh.z < 0.0, -wh, wh)
    wi_local = vec.reflect(-wo_local, wh)
    wi_spec = vec.normalize(local_to_world(normal, wi_local))
    dot_wo_wh = jnp.maximum(vec.dot(wo_local, wh), 1e-6)
    pdf_spec = _trowbridge_reitz_d(wh, roughness) * jnp.abs(wh.z) / (4.0 * dot_wo_wh)
    bsdf_spec = _f_microfacet_refl(albedo, wo_local, wi_local, roughness, metallic)

    # --- diffuse lobe ------------------------------------------------------
    diff = sample_f_diffuse(albedo, normal, xi0, xi1)

    wi = vec.where(choose_spec, wi_spec, diff.wi)
    bsdf = vec.where(choose_spec, bsdf_spec * f, diff.f * (1.0 - f))
    pdf = jnp.where(choose_spec, f_prob * pdf_spec, (1.0 - f_prob) * diff.pdf)
    return LobeSample(wi=wi, f=bsdf, pdf=pdf)
