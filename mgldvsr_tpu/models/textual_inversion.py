"""Textual-inversion embedding manager.

Capability parity with ``EmbeddingManager``
(/root/reference/ldm/modules/embedding_manager.py:32-161): learned
per-placeholder embedding rows substituted into the token-embedding output
before the text transformer runs, with the optional multi-vector expansion
(each placeholder occurrence grows to N consecutive learned rows, sequence
truncated back to its length) and the coarse-init regularizer.

TPU-first/functional split: the *substitution* (single-vector case — the
reference default ``num_vectors_per_token=1``) is a pure ``jnp.where`` that
lives inside jit and is differentiable w.r.t. the learned rows; the
*multi-vector insertion* (embedding_manager.py:111-128) is data-dependent
sequence surgery, so it runs host-side in numpy on the token/embedding
arrays before the jitted encoder — exactly where the reference runs it
(inside the tokenizer/CPU path of ``get_learned_conditioning``).
"""
from __future__ import annotations

from typing import Dict, Mapping, Tuple

import jax.numpy as jnp
import numpy as np

PROGRESSIVE_SCALE = 2000  # embedding_manager.py:10


def init_placeholder_params(
    placeholder_tokens: Mapping[str, int],
    token_dim: int,
    num_vectors_per_token: int = 1,
    init_embeddings: Mapping[str, np.ndarray] | None = None,
    seed: int = 0,
) -> Dict[str, jnp.ndarray]:
    """One learned [num_vectors, token_dim] block per placeholder string
    (embedding_manager.py:71-86): copied from an initializer word's
    embedding when given, else uniform [0,1) as the reference's
    ``torch.rand`` init."""
    rng = np.random.default_rng(seed)
    out: Dict[str, jnp.ndarray] = {}
    for name in placeholder_tokens:
        if init_embeddings and name in init_embeddings:
            row = np.asarray(init_embeddings[name], np.float32).reshape(1, -1)
            out[name] = jnp.asarray(np.repeat(row, num_vectors_per_token, 0))
        else:
            out[name] = jnp.asarray(
                rng.random((num_vectors_per_token, token_dim), np.float32))
    return out


def apply_single_vector(
    params: Mapping[str, jnp.ndarray],
    placeholder_tokens: Mapping[str, int],
    tokens: jnp.ndarray,
    embedded: jnp.ndarray,
) -> jnp.ndarray:
    """Replace each placeholder token's embedding row with its learned row
    (embedding_manager.py:107-109). Jittable, grads flow to ``params``."""
    for name, tok in placeholder_tokens.items():
        row = params[name][0].astype(embedded.dtype)
        hit = (tokens == tok)[..., None]
        embedded = jnp.where(hit, row[None, None, :], embedded)
    return embedded


def expand_multi_vector(
    params: Mapping[str, jnp.ndarray],
    placeholder_tokens: Mapping[str, int],
    tokens: np.ndarray,
    embedded: np.ndarray,
    progressive_counter: int | None = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Multi-vector insertion (embedding_manager.py:111-128): every
    occurrence of a placeholder becomes ``num_vectors`` consecutive learned
    rows (right-to-left so earlier indices stay valid), then the row is
    truncated back to the original length. Host-side numpy; returns the new
    (tokens, embedded). ``progressive_counter`` enables progressive_words
    (1 + counter // 2000 vectors)."""
    tokens = np.array(tokens)
    embedded = np.array(embedded)
    n = tokens.shape[1]
    for name, tok in placeholder_tokens.items():
        block = np.asarray(params[name], embedded.dtype)
        n_vec = block.shape[0]
        if progressive_counter is not None:
            n_vec = min(n_vec, 1 + progressive_counter // PROGRESSIVE_SCALE)
        rows, cols = np.where(tokens == tok)
        order = np.argsort(-cols)
        for r, c in zip(rows[order], cols[order]):
            tokens[r] = np.concatenate(
                [tokens[r][:c], np.full((n_vec,), tok, tokens.dtype),
                 tokens[r][c + 1:]])[:n]
            embedded[r] = np.concatenate(
                [embedded[r][:c], block[:n_vec], embedded[r][c + 1:]])[:n]
    return tokens, embedded


def embedding_norms_squared(params: Mapping[str, jnp.ndarray]) -> jnp.ndarray:
    """Per-row squared L2 norms over all placeholders
    (embedding_manager.py:142-147)."""
    allp = jnp.concatenate([params[k] for k in sorted(params)], axis=0)
    return jnp.sum(allp * allp, axis=-1)


def coarse_init_loss(
    params: Mapping[str, jnp.ndarray],
    initial: Mapping[str, jnp.ndarray],
) -> jnp.ndarray:
    """Pull optimized rows toward their initializer-word embeddings
    (embedding_manager.py:152-161)."""
    loss = 0.0
    for key in initial:
        d = params[key] - jnp.asarray(initial[key])
        loss = loss + jnp.sum(d @ d.T) / len(initial)
    return jnp.asarray(loss)
