"""Fused single-pass LayerNorm (Pallas).

Profiling the ViTVQGAN step shows XLA's layernorm lowering
(convert→reduce→convert fusions with f32 intermediates in HBM) costing ~25%
of the step. This kernel reads a bf16 row block once, computes f32 statistics
in-registers, and writes the normalized bf16 output — one HBM pass.

Numerics: mean/variance accumulated in float32 exactly like the jnp path in
models/layers.py; biased variance (torch F.layer_norm semantics).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_kernel(x_ref, gamma_ref, beta_ref, o_ref, *, eps: float):
    x = x_ref[:].astype(jnp.float32)  # (rows, d)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * gamma_ref[:].astype(jnp.float32)
    if beta_ref is not None:
        y = y + beta_ref[:].astype(jnp.float32)
    o_ref[:] = y.astype(o_ref.dtype)


def _ln_kernel_nobeta(x_ref, gamma_ref, o_ref, *, eps: float):
    _ln_kernel(x_ref, gamma_ref, None, o_ref, eps=eps)


def fused_layernorm(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray | None = None,
    *,
    eps: float = 1e-5,
    block_rows: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """LayerNorm over the last axis of (..., d). Requires d % 128 == 0 and
    total rows % 8 == 0 (callers fall back to the jnp path otherwise)."""
    orig_shape = x.shape
    d = orig_shape[-1]
    xf = x.reshape(-1, d)
    n = xf.shape[0]
    from attention_models_tpu.ops.ffn import pick_block_rows

    # VMEM budget: f32 working copy + in/out blocks must stay well under the
    # ~16MB scoped limit -> cap rows so br*d(f32) stays ~2MB
    budget = max(8, (512 * 1024) // d // 8 * 8)  # round down to sublanes
    if d % 128:
        raise ValueError(f"unsupported LN shape {orig_shape}")
    try:
        br = pick_block_rows(n, min(block_rows, budget))
    except ValueError as e:
        raise ValueError(f"unsupported LN shape {orig_shape}") from e

    gamma2 = gamma.reshape(1, d)
    args = [xf, gamma2]
    in_specs = [
        pl.BlockSpec((br, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    if beta is not None:
        args.append(beta.reshape(1, d))
        in_specs.append(
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
        kernel = functools.partial(_ln_kernel, eps=eps)
    else:
        kernel = functools.partial(_ln_kernel_nobeta, eps=eps)

    out = pl.pallas_call(
        kernel,
        grid=(n // br,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((br, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, d), x.dtype),
        interpret=interpret,
    )(*args)
    return out.reshape(orig_shape)


def _ln_reference(x, gamma, beta, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) / jnp.sqrt(var + eps)
    y = y * gamma
    if beta is not None:
        y = y + beta
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _ln_with_beta(eps, interpret, x, gamma, beta):
    return fused_layernorm(x, gamma, beta, eps=eps, interpret=interpret)


def _ln_b_fwd(eps, interpret, x, gamma, beta):
    return _ln_with_beta(eps, interpret, x, gamma, beta), (x, gamma, beta)


def _ln_b_bwd(eps, interpret, res, g):
    x, gamma, beta = res
    _, vjp = jax.vjp(lambda x, ga, be: _ln_reference(x, ga, be, eps),
                     x, gamma, beta)
    return vjp(g)


_ln_with_beta.defvjp(_ln_b_fwd, _ln_b_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _ln_no_beta(eps, interpret, x, gamma):
    return fused_layernorm(x, gamma, None, eps=eps, interpret=interpret)


def _ln_nb_fwd(eps, interpret, x, gamma):
    return _ln_no_beta(eps, interpret, x, gamma), (x, gamma)


def _ln_nb_bwd(eps, interpret, res, g):
    x, gamma = res
    _, vjp = jax.vjp(lambda x, ga: _ln_reference(x, ga, None, eps), x, gamma)
    return vjp(g)


_ln_no_beta.defvjp(_ln_nb_fwd, _ln_nb_bwd)


def layernorm(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray | None = None,
    *,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jnp.ndarray:
    """Differentiable LayerNorm: fused Pallas forward on TPU-supported
    shapes, jnp path elsewhere. fp32 statistics in both."""
    if layernorm_supported(x.shape) or interpret:
        if beta is None:
            return _ln_no_beta(eps, interpret, x, gamma)
        return _ln_with_beta(eps, interpret, x, gamma, beta)
    return _ln_reference(x, gamma, beta, eps)


def layernorm_supported(shape: tuple, platform: str | None = None) -> bool:
    from attention_models_tpu.ops.dispatch import on_tpu, rows_lane_tileable

    return on_tpu(platform) and rows_lane_tileable(shape, shape[-1])
