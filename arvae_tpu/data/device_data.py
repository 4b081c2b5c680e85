"""Device-resident datasets: the whole training set lives in HBM.

Measured on this TPU (tunneled transport), a per-batch ``device_put``
costs ~100-200 ms — 100× the 1-2 ms train step — so the host-loader
path is transfer-bound. The TPU-first alternative: upload the dataset
ONCE in its compact form (dSprites bit-packed uint8 is 264 MB for the
full 737k train split; Morpho-MNIST uint8 is 6 MB), then every step
gathers its batch, unpacks bits, and casts to float32 *inside the
jitted step*. Steady-state epochs make zero host→device transfers
(the epoch permutation is generated on device too).

Shapes are static: epochs drop the final partial batch (matching
drop_last semantics); batches are sharded over the mesh's data axis via
a sharding constraint after the gather.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from arvae_tpu.parallel import MeshContext


def unpack_bits(rows: jax.Array, n_bits: int) -> jax.Array:
    """(B, D) uint8 → (B, D*8)[..., :n_bits] float32 — jnp analog of
    np.unpackbits (MSB first)."""
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
    bits = (rows[:, :, None] >> shifts[None, None, :]) & 1
    return bits.reshape(rows.shape[0], -1)[:, :n_bits].astype(jnp.float32)


class DeviceSplit:
    """One split resident on device, with a jit-friendly batch gather.

    ``kind``:
    - ``'packed'``: rows are bit-packed uint8 → unpacked to float32
      images of ``image_shape``;
    - ``'bytes'``: rows are raw uint8 pixels → /255 float32 images;
    - ``'tokens'``: rows are int token sequences, yielded as-is (the
      music batches, where labels ARE the score).
    """

    def __init__(
        self,
        rows: np.ndarray,  # (N, D)
        labels: np.ndarray,  # (N, L)
        image_shape: Tuple[int, ...],
        kind: str,
        ctx: MeshContext,
    ):
        assert kind in ("packed", "bytes", "tokens")
        self.n = len(rows)
        self.image_shape = tuple(image_shape)
        self.kind = kind
        self.ctx = ctx
        self.images = jax.device_put(np.ascontiguousarray(rows),
                                     ctx.replicated)
        self.labels = jax.device_put(np.ascontiguousarray(labels),
                                     ctx.replicated)

    def num_batches(self, batch_size: int) -> int:
        return self.n // batch_size

    def gather_batch(self, images, labels, idx: jax.Array):
        """Inside-jit batch materialization. idx: (B,) int32."""
        rows = jnp.take(images, idx, axis=0)
        labs = jnp.take(labels, idx, axis=0)
        b = idx.shape[0]
        if self.kind == "tokens":
            imgs = rows
        else:
            n_px = int(np.prod(self.image_shape))
            if self.kind == "packed":
                imgs = unpack_bits(rows, n_px)
            else:
                imgs = rows.astype(jnp.float32) / 255.0
            imgs = imgs.reshape((b,) + self.image_shape)
        if self.ctx.n_data > 1:
            imgs = jax.lax.with_sharding_constraint(imgs, self.ctx.batch)
            labs = jax.lax.with_sharding_constraint(labs, self.ctx.batch)
        return imgs, labs


class DeviceEpochRunner:
    """Runs train/eval epochs against device-resident splits.

    ``step_core(state_or_params, (images, labels), key, train)`` is the
    trainer's per-batch computation; this class wraps it with on-device
    batch gathering and permutation so the host only dispatches.
    """

    def __init__(
        self,
        train_split: DeviceSplit,
        val_split: DeviceSplit,
        batch_size: int,
        train_step_core: Callable,  # (state, batch, key) -> (state, metrics)
        eval_step_core: Callable,  # (state, batch, key) -> metrics
        base_key: jax.Array,
        steps_per_call: int = 64,
    ):
        self.train_split = train_split
        self.val_split = val_split
        self.batch_size = batch_size
        self._base_key = base_key
        self.steps_per_call = steps_per_call

        B = batch_size

        # K steps per dispatch via lax.scan: on a tunneled TPU transport
        # each dispatch costs ~5-10 ms RTT, so one dispatch per batch
        # caps throughput; chunking amortizes it K-fold (measured on the
        # dSprites loop: K=16 1123, K=32 2680, K=64 2794, K=128 2771
        # steps/s — scripts/bench_chunk_size.py). Jitted per chunk
        # length (full chunks + one remainder length).
        def make_train_chunk(k_steps: int):
            def chunk(state, images, labels, perm, i0, key):
                def body(st, k):
                    idx = jax.lax.dynamic_slice(perm, ((i0 + k) * B,), (B,))
                    batch = train_split.gather_batch(images, labels, idx)
                    st, metrics = train_step_core(
                        st, batch, jax.random.fold_in(key, k)
                    )
                    return st, metrics
                state, stacked = jax.lax.scan(
                    body, state, jnp.arange(k_steps)
                )
                sums = jax.tree_util.tree_map(
                    lambda m: jnp.sum(m, axis=0), stacked
                )
                first = jax.tree_util.tree_map(lambda m: m[0], stacked)
                return state, sums, first
            return jax.jit(chunk, donate_argnums=(0,))

        def make_eval_chunk(k_steps: int):
            def chunk(state, images, labels, i0, key):
                def body(carry, k):
                    idx = jnp.arange(B, dtype=jnp.int32) + (i0 + k) * B
                    batch = val_split.gather_batch(images, labels, idx)
                    metrics = eval_step_core(
                        state, batch, jax.random.fold_in(key, k)
                    )
                    return carry, metrics
                _, stacked = jax.lax.scan(body, None, jnp.arange(k_steps))
                return jax.tree_util.tree_map(
                    lambda m: jnp.sum(m, axis=0), stacked
                )
            return jax.jit(chunk)

        self._make_train_chunk = make_train_chunk
        self._make_eval_chunk = make_eval_chunk
        self._train_chunks = {}
        self._eval_chunks = {}

    def _train_chunk(self, k):
        if k not in self._train_chunks:
            self._train_chunks[k] = self._make_train_chunk(k)
        return self._train_chunks[k]

    def _eval_chunk(self, k):
        if k not in self._eval_chunks:
            self._eval_chunks[k] = self._make_eval_chunk(k)
        return self._eval_chunks[k]

    def train_epoch(self, state, epoch_num: int):
        sp = self.train_split
        steps = sp.num_batches(self.batch_size)
        perm = jax.random.permutation(
            jax.random.fold_in(self._base_key, 500_000 + epoch_num), sp.n
        ).astype(jnp.int32)
        totals, first_metrics = None, None
        i = 0
        while i < steps:
            k = min(self.steps_per_call, steps - i)
            key = jax.random.fold_in(
                self._base_key, (epoch_num + 1) * 100003 + i * 2 + 1
            )
            state, sums, first = self._train_chunk(k)(
                state, sp.images, sp.labels, perm, i, key
            )
            if i == 0:
                first_metrics = first
            totals = (
                sums if totals is None
                else jax.tree_util.tree_map(jnp.add, totals, sums)
            )
            i += k
        return state, totals, max(steps, 1), first_metrics

    def eval_epoch(self, state, epoch_num: int):
        sp = self.val_split
        steps = sp.num_batches(self.batch_size)
        totals = None
        i = 0
        while i < steps:
            k = min(self.steps_per_call, steps - i)
            key = jax.random.fold_in(
                self._base_key, (epoch_num + 1) * 100003 + i * 2
            )
            sums = self._eval_chunk(k)(state, sp.images, sp.labels, i, key)
            totals = (
                sums if totals is None
                else jax.tree_util.tree_map(jnp.add, totals, sums)
            )
            i += k
        return totals, max(steps, 1)
