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
from typing import Any, Optional, Sequence

import jax
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


def batch_sharding(ctx: MeshContext) -> NamedSharding:
    return ctx.batch


def replicated_sharding(ctx: MeshContext) -> NamedSharding:
    return ctx.replicated


def shard_batch(ctx: MeshContext, batch: Any) -> Any:
    """Device-puts a host batch, sharding the leading axis over 'data'.

    Arrays whose leading dimension does not divide the data axis are
    padded by repeating the final element (the pad elements are real
    data repeats; trainers weight per-example reductions accordingly
    when exactness matters — the epoch drivers always use
    divisible batch sizes so padding only arises in ad-hoc eval).
    """

    def _put(x):
        x = np.asarray(x)
        d = ctx.n_data
        if x.shape[0] % d != 0:
            pad = ctx.pad_batch(x.shape[0]) - x.shape[0]
            x = np.concatenate([x, np.repeat(x[-1:], pad, axis=0)], axis=0)
        return jax.device_put(x, ctx.batch)

    return jax.tree_util.tree_map(_put, batch)


def shard_pytree_replicated(ctx: MeshContext, tree: Any) -> Any:
    """Device-puts a pytree fully replicated over the mesh."""
    return jax.device_put(tree, ctx.replicated)
