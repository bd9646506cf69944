"""GELU for matmul-adjacent hot paths.

XLA's exact-erf GELU is VPU-bound when fused into a TPU matmul: profiled at
p6c18 stage-2 geometry ((6432, 4096) operand into a 4096x1024 dot), erf adds
~0.34 ms to the forward matmul and ~0.53 ms to the backward pair, while a
sigmoid-form GELU fuses for free (XLA's tanh is even slower than erf; its
logistic is cheap).

`gelu(x)` therefore dispatches on dtype:

* bf16 inputs use the tanh-form GELU rewritten via the identity
  ``tanh(z) = 2*sigmoid(2*z) - 1``::

      gelu_tanh(x) = x * sigmoid(2*sqrt(2/pi) * (x + 0.044715 * x**3))

  This is mathematically the standard tanh approximation (max deviation from
  exact erf-GELU ~3e-3, verified 2.7e-5 from jax.nn.gelu(approximate=True)
  in f32), which is BELOW bf16 resolution: measured over 2^20 N(0,1) samples,
  max |gelu_fast_bf16 - gelu_erf_f32| = 0.00703 == max |gelu_erf_bf16 -
  gelu_erf_f32| — i.e. in bf16 the two are indistinguishable beyond rounding.

* f32 (and any other dtype) keeps exact erf GELU — the reference-parity path
  (the torch reference uses nn.GELU()'s erf form, e.g.
  /root/reference/modules/dynamic_modules/stackgpt.py MLP).
"""
import jax
import jax.numpy as jnp

# 2 * sqrt(2 / pi)
_TWO_SQRT_2_OVER_PI = 1.5957691216057308


def gelu(x):
    """Exact-to-dtype GELU: sigmoid-form tanh-GELU for bf16 (fuses freely
    into adjacent TPU matmuls), exact erf GELU otherwise."""
    if x.dtype == jnp.bfloat16:
        return x * jax.nn.sigmoid(
            _TWO_SQRT_2_OVER_PI * (x + 0.044715 * (x * x * x))
        )
    return jax.nn.gelu(x, approximate=False)
