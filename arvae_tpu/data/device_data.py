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

On a multi-chip data axis the split itself is row-sharded: each chip
stores ``N/d`` rows, and the batch gather runs under ``shard_map`` —
every chip contributes the requested rows it owns to the (B, D) batch
and a ``psum_scatter`` over the data axis hands each chip its local
``B/d`` slice. Per-step communication is one batch of packed rows
(tens of KB) instead of each chip holding the whole split (264 MB for
full dSprites), and the batches are bit-identical to the replicated
path because the global epoch permutation is unchanged.
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

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
        labels: Optional[np.ndarray],  # (N, L); None or rows itself ⇒
        #                                labels ARE the rows (one HBM
        #                                copy, one gather — the music
        #                                splits)
        image_shape: Tuple[int, ...],
        kind: str,
        ctx: MeshContext,
        row_sharded: Optional[bool] = None,  # default: shard iff n_data > 1
    ):
        assert kind in ("packed", "bytes", "tokens")
        self.n = len(rows)
        self.image_shape = tuple(image_shape)
        self.kind = kind
        self.ctx = ctx
        self.labels_are_rows = labels is None or labels is rows
        if row_sharded is None:
            row_sharded = ctx.n_data > 1
        self.row_sharded = row_sharded and ctx.n_data > 1
        rows = np.ascontiguousarray(rows)
        if not self.labels_are_rows:
            labels = np.ascontiguousarray(labels)
        if self.row_sharded:
            # Each chip stores N/d rows. Pad with zero rows up to
            # divisibility; the epoch permutation only emits indices
            # < self.n, so pad rows are never gathered.
            d = ctx.n_data
            n_pad = ctx.pad_batch(self.n)
            if n_pad != self.n:
                rows = np.concatenate(
                    [rows, np.zeros((n_pad - self.n,) + rows.shape[1:],
                                    rows.dtype)], axis=0)
                if not self.labels_are_rows:
                    labels = np.concatenate(
                        [labels,
                         np.zeros((n_pad - self.n,) + labels.shape[1:],
                                  labels.dtype)], axis=0)
            self.local_n = n_pad // d
            self.images = jax.device_put(rows, ctx.batch)
            self.labels = (self.images if self.labels_are_rows
                           else jax.device_put(labels, ctx.batch))
        else:
            self.images = jax.device_put(rows, ctx.replicated)
            self.labels = (self.images if self.labels_are_rows
                           else jax.device_put(labels, ctx.replicated))

    def num_batches(self, batch_size: int) -> int:
        return self.n // batch_size

    def _sharded_take(self, images, labels, idx: jax.Array):
        """Distributed row gather over the data axis.

        Each chip looks up which of the B requested global rows fall in
        its own shard, contributes those (zeros elsewhere), and a
        tiled ``psum_scatter`` both sums the contributions and deals
        chip k its rows ``idx[k*B/d:(k+1)*B/d]`` — i.e. the batch comes
        out already sharded P('data') with exactly the rows a replicated
        ``jnp.take`` would produce. Collective payload: one (B, D)
        packed-row batch, not the dataset.
        """
        local_n = self.local_n

        def make_contrib(li, ok):
            def contrib(x):
                g = jnp.take(x, li, axis=0)
                mask = ok.reshape((-1,) + (1,) * (g.ndim - 1))
                dt = g.dtype
                # Sub-word ints ride the collective as int32; 64-bit
                # ints keep their width (a cast to int32 would silently
                # truncate values outside int32 range — ADVICE r3).
                if jnp.issubdtype(dt, jnp.integer):
                    wide = (jnp.int64 if jnp.dtype(dt).itemsize == 8
                            else jnp.int32)
                else:
                    wide = dt
                g = jnp.where(mask, g, 0).astype(wide)
                g = jax.lax.psum_scatter(
                    g, "data", scatter_dimension=0, tiled=True
                )
                return g.astype(dt)

            return contrib

        def local_idx(idx_full):
            offset = jax.lax.axis_index("data") * local_n
            li = idx_full - offset
            ok = (li >= 0) & (li < local_n)
            return jnp.clip(li, 0, local_n - 1), ok

        if self.labels_are_rows:
            # one collective, returned for both roles

            def body1(rows_l, idx_full):
                li, ok = local_idx(idx_full)
                return make_contrib(li, ok)(rows_l)

            g = jax.shard_map(
                body1,
                mesh=self.ctx.mesh,
                in_specs=(P("data"), P()),
                out_specs=P("data"),
                check_vma=False,
            )(images, idx)
            return g, g

        def body(rows_l, labs_l, idx_full):
            li, ok = local_idx(idx_full)
            contrib = make_contrib(li, ok)
            return contrib(rows_l), contrib(labs_l)

        return jax.shard_map(
            body,
            mesh=self.ctx.mesh,
            in_specs=(P("data"), P("data"), P()),
            out_specs=(P("data"), P("data")),
            check_vma=False,
        )(images, labels, idx)

    def gather_batch(self, images, labels, idx: jax.Array):
        """Inside-jit batch materialization. idx: (B,) int32."""
        if self.row_sharded:
            b = idx.shape[0]
            d = self.ctx.n_data
            if b % d == 0:
                rows, labs = self._sharded_take(images, labels, idx)
            else:
                # Pad idx up to the data axis (repeating the last index)
                # so the gather stays shard-local — a plain jnp.take on
                # the row-sharded table would make XLA all-gather the
                # whole dataset — then drop the pad rows.
                pad = self.ctx.pad_batch(b) - b
                idx_p = jnp.concatenate(
                    [idx, jnp.broadcast_to(idx[-1:], (pad,))])
                rows, labs = self._sharded_take(images, labels, idx_p)
                rows = rows[:b]
                labs = labs[:b]
        else:
            rows = jnp.take(images, idx, axis=0)
            labs = (rows if self.labels_are_rows
                    else jnp.take(labels, idx, axis=0))
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
        unroll: int = None,
        default_unroll: int = 4,
    ):
        self.train_split = train_split
        self.val_split = val_split
        self.batch_size = batch_size
        self._base_key = base_key
        self.steps_per_call = steps_per_call
        # Scan-unroll factor for the train chunk: inlining N consecutive
        # steps per scan iteration lets XLA schedule across the step
        # boundary (measured +5.6% on the dSprites headline step and
        # +4.1% on the MeasureVAE hot step at unroll=4 —
        # logs/r5/image-unroll.out, logs/r5/unroll.jsonl). The
        # trajectory is bit-identical (test-pinned), so this defaults
        # on wherever an accelerator backend is present; CPU keeps
        # unroll=1 because the only cost is compile time (the inlined
        # body is ~4x larger), which dominates on the test suite's
        # XLA:CPU path. Only applied when it divides the chunk length —
        # the remainder chunk keeps unroll=1.
        #
        # `default_unroll` is the caller's measured per-workload optimum
        # (the 4/8/16 probe gave the image conv step +3.1% at 8 while
        # the music recurrence step is flat-to-negative past 4 —
        # docs/design.md round-5 decisions); `ARVAE_SCAN_UNROLL` still
        # overrides everything for experiments.
        if unroll is None:
            env = os.environ.get("ARVAE_SCAN_UNROLL")
            if env is not None:
                unroll = int(env)
            else:
                unroll = (1 if jax.devices()[0].platform == "cpu"
                          else default_unroll)
        if unroll < 1:
            raise ValueError(f"unroll must be >= 1, got {unroll}")
        self.unroll = unroll

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
                    body, state, jnp.arange(k_steps),
                    unroll=(self.unroll
                            if k_steps % self.unroll == 0 else 1),
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
            # own fold_in domain: 500_000+epoch landed inside the chunk
            # keys' (epoch+1)*100003 + 2i range, so some epochs' shuffle
            # keys equalled other epochs' dropout/sample keys
            jax.random.fold_in(self._base_key, (1 << 30) + epoch_num), sp.n
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
