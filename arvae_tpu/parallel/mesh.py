"""Device mesh + sharding utilities.

The reference framework (ashispati/ar-vae) is single-process,
single-device — its only device boundary is a per-batch ``.cuda()``
copy (reference ``utils/trainer.py:156-160``) and there is no
``torch.distributed`` anywhere. In this TPU-native re-design, data
parallelism is first-class and *free*: we lay a 1-D
``jax.sharding.Mesh`` over all chips, shard the batch dimension over
the ``data`` axis, replicate parameters, and let XLA insert the
gradient ``psum`` over ICI when the jitted train step is compiled.

A second (size-1 by default) ``model`` axis is kept in the mesh so
tensor-parallel sharding rules remain expressible without code changes
(the models here are ≤ a few M params, so TP is never required for
capacity — see SURVEY.md §2 parallelism inventory).

Semantics note for the AR regularization loss under data parallelism:
the loss is pairwise over the batch (B×B). With batch sharded on
``data`` and the loss written as a plain jnp outer-difference, XLA
all-gathers the single (B,)-sized latent column per regularized
dimension — a few KB over ICI — giving *exact global-batch* pair
semantics (the cheap option identified in SURVEY.md §5.7).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshContext:
    """A mesh plus the canonical shardings used by the trainers."""

    mesh: Mesh

    @property
    def n_data(self) -> int:
        return self.mesh.shape["data"]

    @property
    def n_model(self) -> int:
        return self.mesh.shape["model"]

    @property
    def batch(self) -> NamedSharding:
        """Batch tensors: leading axis sharded over the data axis."""
        return NamedSharding(self.mesh, P("data"))

    @property
    def replicated(self) -> NamedSharding:
        """Parameters / optimizer state: fully replicated."""
        return NamedSharding(self.mesh, P())

    def pad_batch(self, n: int) -> int:
        """Rounds ``n`` up so it divides evenly over the data axis."""
        d = self.n_data
        return ((n + d - 1) // d) * d


def create_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data_parallel: Optional[int] = None,
    model_parallel: int = 1,
) -> MeshContext:
    """Builds a ('data', 'model') mesh over the available devices.

    Args:
      devices: devices to use; defaults to ``jax.devices()``.
      data_parallel: size of the data axis; defaults to
        ``len(devices) // model_parallel``.
      model_parallel: size of the model axis (1 for pure DP).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data_parallel is None:
        data_parallel = n // model_parallel
    if data_parallel * model_parallel != n:
        raise ValueError(
            f"mesh shape ({data_parallel}, {model_parallel}) != #devices {n}"
        )
    dev_array = np.asarray(devices).reshape(data_parallel, model_parallel)
    mesh = Mesh(dev_array, axis_names=("data", "model"))
    return MeshContext(mesh=mesh)


def shard_batch(ctx: MeshContext, batch: Any) -> Any:
    """Device-puts a host batch, sharding the leading axis over 'data'.

    Raises on leading dimensions that do not divide the data axis —
    silent padding biases any per-example mean computed downstream.
    Callers with genuinely ragged batches choose their semantics
    explicitly: ``shard_batch_padded`` (zero-pad + weight mask, exact
    means via ``masked_mean``) or ``shard_batch_truncated`` (drop the
    remainder rows).
    """

    def _put(x):
        x = np.asarray(x)
        d = ctx.n_data
        if x.shape[0] % d != 0:
            raise ValueError(
                f"batch leading dim {x.shape[0]} does not divide the "
                f"data axis ({d}); use shard_batch_padded (mask) or "
                "shard_batch_truncated (drop remainder)"
            )
        return jax.device_put(x, ctx.batch)

    return jax.tree_util.tree_map(_put, batch)


def _leading_dim(batch: Any) -> int:
    """The common leading-axis size of every leaf, or raises."""
    sizes = {np.asarray(x).shape[0] for x in jax.tree_util.tree_leaves(batch)}
    if len(sizes) != 1:
        raise ValueError(f"inconsistent leading dims in batch: {sizes}")
    (n,) = sizes
    return n


def shard_batch_padded(ctx: MeshContext, batch: Any) -> Tuple[Any, jax.Array]:
    """Zero-pads each array's leading axis up to a multiple of the data
    axis and device-puts it sharded; returns ``(batch, mask)`` where
    ``mask`` is float32 (N_padded,) with 1.0 on real rows.

    Reductions over the padded batch stay exact through
    ``masked_mean(values, mask)``.
    """
    n = _leading_dim(batch)
    n_pad = ctx.pad_batch(n)

    def _put(x):
        x = np.asarray(x)
        if n_pad != n:
            pad_shape = (n_pad - n,) + x.shape[1:]
            x = np.concatenate([x, np.zeros(pad_shape, x.dtype)], axis=0)
        return jax.device_put(x, ctx.batch)

    mask = np.zeros((n_pad,), np.float32)
    mask[:n] = 1.0
    return (
        jax.tree_util.tree_map(_put, batch),
        jax.device_put(mask, ctx.batch),
    )


def masked_mean(values: jax.Array, mask: jax.Array) -> jax.Array:
    """Mean over the elements of ``values`` belonging to rows where
    ``mask`` is 1 — unbiased under ``shard_batch_padded`` padding."""
    mask = mask.reshape((mask.shape[0],) + (1,) * (values.ndim - 1))
    n_per_row = values.size // values.shape[0]
    return jnp.sum(values * mask) / jnp.maximum(
        jnp.sum(mask) * n_per_row, 1.0
    )


def shard_batch_truncated(ctx: MeshContext, batch: Any) -> Optional[Any]:
    """Drops up to ``n_data - 1`` trailing rows so the leading axis
    divides the data axis, then device-puts sharded. A no-op on a
    1-device data axis (the single-chip case): every batch divides.

    Returns ``None`` when truncation would leave zero rows (a final
    partial batch smaller than the data axis) — a zero-row batch makes
    downstream per-batch means 0/0 NaNs, so callers must skip it.
    """
    d = ctx.n_data
    if _leading_dim(batch) // d == 0:
        return None

    def _put(x):
        x = np.asarray(x)
        keep = (x.shape[0] // d) * d
        return jax.device_put(x[:keep], ctx.batch)

    return jax.tree_util.tree_map(_put, batch)


def shard_pytree_replicated(ctx: MeshContext, tree: Any) -> Any:
    """Device-puts a pytree fully replicated over the mesh."""
    return jax.device_put(tree, ctx.replicated)
