"""Keras-2.0.8-exact Adam / RMSprop as optax transformations.

Gradient parity vs the executing reference is established by
tools/ref_parity_check.py --grads; the remaining training-step delta is the
optimizer update rule. The reference trains with Keras 2.0.8's optimizers
(constructed at vae_definition.py:174-175 and in the classifier scripts,
e.g. pitch_classifier.py:100-101), whose semantics differ from optax's in
two places:

* Adam folds bias correction into the step size
  (``lr_t = lr * sqrt(1-b2^t)/(1-b1^t)``) and adds epsilon to the
  UNCORRECTED ``sqrt(v_t)`` -- algebraically an effective epsilon of
  ``eps/sqrt(1-b2^t)`` vs optax's constant eps (~31.6x larger at t=1,
  converging to eps as t grows).
* RMSprop adds epsilon OUTSIDE the square root
  (``g / (sqrt(a_t) + eps)``); optax.rmsprop puts it inside
  (``g * rsqrt(a_t + eps)``).

Defaults mirror Keras 2.0.8: Adam(beta_1=0.9, beta_2=0.999, epsilon=1e-8,
decay=0), RMSprop(rho=0.9, epsilon=1e-8, decay=0). The time-decay term is
``lr / (1 + decay * iterations)`` with iterations counting completed steps.

Opt in with ``--set optimizer=adam_keras`` (or ``rmsprop_keras``); the
defaults stay on optax's stock implementations, which are equivalent for
every practical purpose once v_t accumulates.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class KerasAdamState(NamedTuple):
    count: jnp.ndarray  # completed steps (Keras ``iterations``)
    m: optax.Updates
    v: optax.Updates


def keras_adam(
    learning_rate: float,
    beta_1: float = 0.9,
    beta_2: float = 0.999,
    epsilon: float = 1e-8,
    decay: float = 0.0,
) -> optax.GradientTransformation:
    """Keras 2.0.8 Adam: p -= lr_t * m_t / (sqrt(v_t) + eps)."""

    def init_fn(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return KerasAdamState(
            count=jnp.zeros([], jnp.int32),
            m=zeros,
            v=jax.tree.map(jnp.zeros_like, params),
        )

    def update_fn(updates, state, params=None):
        del params
        count = state.count
        lr = learning_rate / (1.0 + decay * count.astype(jnp.float32))
        t = (count + 1).astype(jnp.float32)
        lr_t = lr * jnp.sqrt(1.0 - beta_2**t) / (1.0 - beta_1**t)
        m = jax.tree.map(
            lambda mm, g: beta_1 * mm + (1.0 - beta_1) * g, state.m, updates
        )
        v = jax.tree.map(
            lambda vv, g: beta_2 * vv + (1.0 - beta_2) * jnp.square(g),
            state.v,
            updates,
        )
        new_updates = jax.tree.map(
            lambda mm, vv: -lr_t * mm / (jnp.sqrt(vv) + epsilon), m, v
        )
        return new_updates, KerasAdamState(count=count + 1, m=m, v=v)

    return optax.GradientTransformation(init_fn, update_fn)


class KerasRMSpropState(NamedTuple):
    count: jnp.ndarray
    a: optax.Updates  # accumulated squared gradients


def keras_rmsprop(
    learning_rate: float,
    rho: float = 0.9,
    epsilon: float = 1e-8,
    decay: float = 0.0,
) -> optax.GradientTransformation:
    """Keras 2.0.8 RMSprop: p -= lr * g / (sqrt(a_t) + eps)."""

    def init_fn(params):
        return KerasRMSpropState(
            count=jnp.zeros([], jnp.int32),
            a=jax.tree.map(jnp.zeros_like, params),
        )

    def update_fn(updates, state, params=None):
        del params
        lr = learning_rate / (1.0 + decay * state.count.astype(jnp.float32))
        a = jax.tree.map(
            lambda aa, g: rho * aa + (1.0 - rho) * jnp.square(g),
            state.a,
            updates,
        )
        new_updates = jax.tree.map(
            lambda aa, g: -lr * g / (jnp.sqrt(aa) + epsilon), a, updates
        )
        return new_updates, KerasRMSpropState(count=state.count + 1, a=a)

    return optax.GradientTransformation(init_fn, update_fn)
