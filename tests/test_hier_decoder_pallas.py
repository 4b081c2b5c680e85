"""Fused hierarchical-decoder kernel vs the XLA-scan path.

Forced through interpret mode off-TPU (ARVAE_FORCE_GRU_PALLAS); dropout
is 0 so both paths are bit-comparable (the kernel's dropout uses the
TPU PRNG, a different stream than jax.random).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arvae_tpu.models.measure_vae import MEASURE_SEQ_LEN, MeasureVAE
from arvae_tpu.ops.losses import token_cross_entropy_loss

B, H, V = 8, 128, 130


@pytest.fixture(scope="module")
def model_and_params():
    model = MeasureVAE(
        num_notes=V,
        encoder_hidden_size=128,
        decoder_hidden_size=H,
        latent_space_dim=32,
        encoder_dropout_prob=0.0,
        decoder_dropout_prob=0.0,
    )
    params = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1),
         "dropout": jax.random.key(2)},
        jnp.zeros((1, MEASURE_SEQ_LEN), jnp.int32), train=True,
    )["params"]
    return model, params


def _score():
    rng = np.random.RandomState(3)
    return jnp.asarray(rng.randint(0, V, (B, MEASURE_SEQ_LEN)), jnp.int32)


def _run(model, params, score, key, train, monkeypatch, fused: bool):
    if fused:
        monkeypatch.delenv("ARVAE_NO_GRU_PALLAS", raising=False)
        monkeypatch.setenv("ARVAE_FORCE_GRU_PALLAS", "1")
    else:
        monkeypatch.delenv("ARVAE_FORCE_GRU_PALLAS", raising=False)
        monkeypatch.setenv("ARVAE_NO_GRU_PALLAS", "1")
    return model.apply({"params": params}, score, train=train, rng_key=key)


@pytest.mark.parametrize("train", [False, True])
def test_forward_matches_scan(model_and_params, monkeypatch, train):
    model, params = model_and_params
    score = _score()
    key = jax.random.key(7)
    out_ref = _run(model, params, score, key, train, monkeypatch, fused=False)
    out_k = _run(model, params, score, key, train, monkeypatch, fused=True)
    np.testing.assert_array_equal(np.asarray(out_k.samples),
                                  np.asarray(out_ref.samples))
    np.testing.assert_allclose(np.asarray(out_k.weights),
                               np.asarray(out_ref.weights),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("tf_key_seed", [7, 11])
def test_gradients_match_scan(model_and_params, monkeypatch, tf_key_seed):
    # two key seeds so both teacher-forced and free-running branches of
    # the per-batch coin flip are exercised
    model, params = model_and_params
    score = _score()
    key = jax.random.key(tf_key_seed)

    def loss(p, fused):
        if fused:
            monkeypatch.delenv("ARVAE_NO_GRU_PALLAS", raising=False)
            monkeypatch.setenv("ARVAE_FORCE_GRU_PALLAS", "1")
        else:
            monkeypatch.delenv("ARVAE_FORCE_GRU_PALLAS", raising=False)
            monkeypatch.setenv("ARVAE_NO_GRU_PALLAS", "1")
        out = model.apply({"params": p}, score, train=True, rng_key=key)
        return (token_cross_entropy_loss(out.weights, score)
                + jnp.mean(out.z_mean ** 2))

    v_ref, g_ref = jax.value_and_grad(lambda p: loss(p, False))(params)
    v_k, g_k = jax.value_and_grad(lambda p: loss(p, True))(params)
    np.testing.assert_allclose(float(v_k), float(v_ref), rtol=1e-5)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_k = dict(
        (jax.tree_util.keystr(kp), leaf)
        for kp, leaf in jax.tree_util.tree_leaves_with_path(g_k)
    )
    for kp, leaf_ref in flat_ref:
        name = jax.tree_util.keystr(kp)
        np.testing.assert_allclose(
            np.asarray(flat_k[name]), np.asarray(leaf_ref),
            rtol=2e-4, atol=1e-6, err_msg=name,
        )


class TestSRDecoderFused:
    """The same kernel drives SRDecoder (ticks_per_beat == T, zero
    hidden init, z-conditioning as the single beat row)."""

    @pytest.fixture(scope="class")
    def sr_model_and_params(self):
        model = MeasureVAE(
            num_notes=V,
            encoder_hidden_size=128,
            decoder_hidden_size=H,
            latent_space_dim=32,
            encoder_dropout_prob=0.0,
            decoder_dropout_prob=0.0,
            decoder_type="sr",
        )
        params = model.init(
            {"params": jax.random.key(0), "sample": jax.random.key(1),
             "dropout": jax.random.key(2)},
            jnp.zeros((1, MEASURE_SEQ_LEN), jnp.int32), train=True,
        )["params"]
        return model, params

    @pytest.mark.parametrize("train", [False, True])
    def test_forward_matches_scan(self, sr_model_and_params, monkeypatch,
                                  train):
        model, params = sr_model_and_params
        score = _score()
        key = jax.random.key(5)
        out_ref = _run(model, params, score, key, train, monkeypatch,
                       fused=False)
        out_k = _run(model, params, score, key, train, monkeypatch,
                     fused=True)
        np.testing.assert_array_equal(np.asarray(out_k.samples),
                                      np.asarray(out_ref.samples))
        np.testing.assert_allclose(np.asarray(out_k.weights),
                                   np.asarray(out_ref.weights),
                                   rtol=1e-5, atol=1e-5)

    def test_gradients_match_scan(self, sr_model_and_params, monkeypatch):
        model, params = sr_model_and_params
        score = _score()
        key = jax.random.key(5)

        def loss(p, fused):
            if fused:
                monkeypatch.delenv("ARVAE_NO_GRU_PALLAS", raising=False)
                monkeypatch.setenv("ARVAE_FORCE_GRU_PALLAS", "1")
            else:
                monkeypatch.delenv("ARVAE_FORCE_GRU_PALLAS", raising=False)
                monkeypatch.setenv("ARVAE_NO_GRU_PALLAS", "1")
            out = model.apply({"params": p}, score, train=True, rng_key=key)
            return (token_cross_entropy_loss(out.weights, score)
                    + jnp.mean(out.z_mean ** 2))

        v_ref, g_ref = jax.value_and_grad(lambda p: loss(p, False))(params)
        v_k, g_k = jax.value_and_grad(lambda p: loss(p, True))(params)
        np.testing.assert_allclose(float(v_k), float(v_ref), rtol=1e-5)
        ref = jax.tree_util.tree_leaves_with_path(g_ref)
        kk = dict((jax.tree_util.keystr(kp), leaf)
                  for kp, leaf in jax.tree_util.tree_leaves_with_path(g_k))
        for kp, leaf_ref in ref:
            name = jax.tree_util.keystr(kp)
            np.testing.assert_allclose(
                np.asarray(kk[name]), np.asarray(leaf_ref),
                rtol=2e-4, atol=1e-6, err_msg=name,
            )


def test_fused_kernels_under_data_parallel_sharding(model_and_params,
                                                    monkeypatch):
    """The fused recurrence kernels must compose with GSPMD: a batch
    sharded over the 8-device data axis gives the same loss/grads as the
    single-device computation (XLA partitions the pallas custom-calls)."""
    from arvae_tpu.parallel import create_mesh, shard_batch

    model, params = model_and_params
    score = _score()  # B=8 → one row per device
    key = jax.random.key(13)
    monkeypatch.delenv("ARVAE_NO_GRU_PALLAS", raising=False)
    monkeypatch.setenv("ARVAE_FORCE_GRU_PALLAS", "1")

    def loss(p, s):
        out = model.apply({"params": p}, s, train=True, rng_key=key)
        return (token_cross_entropy_loss(out.weights, s)
                + jnp.mean(out.z_mean ** 2))

    vg = jax.jit(jax.value_and_grad(loss))
    v1, g1 = vg(params, score)

    ctx = create_mesh()
    p_r = jax.device_put(params, ctx.replicated)
    s_s = shard_batch(ctx, np.asarray(score))
    v8, g8 = vg(p_r, s_s)

    np.testing.assert_allclose(float(v8), float(v1), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-7),
        g8, g1,
    )


class TestBatchSlicedFused:
    """Batches past the VMEM guard run the kernel over independent
    batch slices (ops/hier_decoder_pallas.fused_slices) instead of
    falling back to the XLA scan."""

    def test_slice_policy(self):
        from arvae_tpu.ops.hier_decoder_pallas import fused_slices, supports

        # H=128/V=130: B=1024 fits directly (~11.8 MB), B=2048 does not
        # (~21.5 MB) — the calibrated VMEM model in `supports`
        assert supports(1024, 128, 2, 130, 24, "argmax")
        assert not supports(2048, 128, 2, 130, 24, "argmax")
        assert fused_slices(1024, 128, 2, 130, 24, "argmax") == 1
        assert fused_slices(2048, 128, 2, 130, 24, "argmax") == 2
        assert fused_slices(4096, 128, 2, 130, 24, "argmax") == 4
        # unsupported regardless of slicing: wrong layer count, and odd
        # batches that never reach a %8 slice
        assert fused_slices(2048, 128, 3, 130, 24, "argmax") == 0
        assert fused_slices(12, 128, 2, 130, 24, "argmax") == 0

    def test_slice_cap_env(self, monkeypatch):
        from arvae_tpu.ops.hier_decoder_pallas import fused_slices

        monkeypatch.setenv("ARVAE_FUSED_MAX_BATCH", "256")
        assert fused_slices(1024, 128, 2, 130, 24, "argmax") == 4

    @pytest.mark.parametrize("decoder_type", ["hier", "sr"])
    def test_sliced_matches_scan(self, model_and_params, monkeypatch,
                                 decoder_type):
        """B=16 capped at 8-row slices: the 2-slice fused path must equal
        the scan path bit-for-bit (dropout 0, argmax — the only
        per-slice-seed consumers are off)."""
        if decoder_type == "hier":
            model, params = model_and_params
        else:
            model = MeasureVAE(
                num_notes=V, encoder_hidden_size=128,
                decoder_hidden_size=H, latent_space_dim=32,
                encoder_dropout_prob=0.0, decoder_dropout_prob=0.0,
                decoder_type="sr",
            )
            params = model.init(
                {"params": jax.random.key(0), "sample": jax.random.key(1),
                 "dropout": jax.random.key(2)},
                jnp.zeros((1, MEASURE_SEQ_LEN), jnp.int32), train=True,
            )["params"]
        rng = np.random.RandomState(17)
        score = jnp.asarray(rng.randint(0, V, (16, MEASURE_SEQ_LEN)),
                            jnp.int32)
        key = jax.random.key(23)

        def loss(p, fused):
            if fused:
                monkeypatch.delenv("ARVAE_NO_GRU_PALLAS", raising=False)
                monkeypatch.setenv("ARVAE_FORCE_GRU_PALLAS", "1")
                monkeypatch.setenv("ARVAE_FUSED_MAX_BATCH", "8")
            else:
                monkeypatch.delenv("ARVAE_FORCE_GRU_PALLAS", raising=False)
                monkeypatch.delenv("ARVAE_FUSED_MAX_BATCH", raising=False)
                monkeypatch.setenv("ARVAE_NO_GRU_PALLAS", "1")
            out = model.apply({"params": p}, score, train=True, rng_key=key)
            return (token_cross_entropy_loss(out.weights, score)
                    + jnp.mean(out.z_mean ** 2))

        from arvae_tpu.ops.hier_decoder_pallas import fused_slices
        monkeypatch.setenv("ARVAE_FUSED_MAX_BATCH", "8")
        assert fused_slices(16, H, 2, V, MEASURE_SEQ_LEN, "argmax") == 2

        v_ref, g_ref = jax.value_and_grad(lambda p: loss(p, False))(params)
        v_k, g_k = jax.value_and_grad(lambda p: loss(p, True))(params)
        np.testing.assert_allclose(float(v_k), float(v_ref), rtol=1e-5)
        ref = jax.tree_util.tree_leaves_with_path(g_ref)
        kk = dict((jax.tree_util.keystr(kp), leaf)
                  for kp, leaf in jax.tree_util.tree_leaves_with_path(g_k))
        for kp, leaf_ref in ref:
            name = jax.tree_util.keystr(kp)
            np.testing.assert_allclose(
                np.asarray(kk[name]), np.asarray(leaf_ref),
                rtol=2e-4, atol=1e-6, err_msg=name,
            )


class TestMultinomialSampling:
    """Gumbel-max multinomial in the fused kernel (same distribution as
    jax.random.categorical over the same logits)."""

    def _chain_args(self, out_b):
        rng = np.random.RandomState(0)
        Hh, E, Vv, Bb, T = 128, 10, 130, 8, MEASURE_SEQ_LEN
        z = lambda *sh: jnp.zeros(sh, jnp.float32)  # noqa: E731
        return dict(
            teacher=jnp.int32(0), seed=jnp.int32(11),
            score=jnp.asarray(rng.randint(0, Vv, (T, Bb)), jnp.int32),
            gi_beat=z(4, Bb, 3 * Hh), tick_h0=z(4, 2, Bb, Hh),
            x0=z(Bb, E), emb=z(Vv, E), w_ih0e=z(E, 3 * Hh),
            w_hh0=z(Hh, 3 * Hh), b_hh0=z(3 * Hh),
            w_ih1=z(Hh, 3 * Hh), b_ih1=z(3 * Hh),
            w_hh1=z(Hh, 3 * Hh), b_hh1=z(3 * Hh),
            out_w=z(Hh, 130), out_b=jnp.asarray(out_b, jnp.float32),
        )

    def test_peaked_logits_deterministic(self, monkeypatch):
        """With one dominant logit, multinomial must equal argmax."""
        from arvae_tpu.ops.hier_decoder_pallas import hier_tick_chain

        out_b = np.zeros(130, np.float32)
        out_b[37] = 1e4
        args = self._chain_args(out_b)
        _, s_multi = hier_tick_chain(
            MEASURE_SEQ_LEN, True, 0.0, 6, "multinomial", *args.values())
        _, s_arg = hier_tick_chain(
            MEASURE_SEQ_LEN, True, 0.0, 6, "argmax", *args.values())
        np.testing.assert_array_equal(np.asarray(s_multi),
                                      np.asarray(s_arg))
        assert int(np.asarray(s_multi)[0, 0]) == 37

    def test_uniform_logits_spread(self):
        """With flat logits, samples must spread over the vocabulary
        (argmax would collapse to index 0)."""
        from arvae_tpu.ops.hier_decoder_pallas import hier_tick_chain

        args = self._chain_args(np.zeros(130, np.float32))
        _, s = hier_tick_chain(
            MEASURE_SEQ_LEN, True, 0.0, 6, "multinomial", *args.values())
        toks = np.asarray(s).ravel()  # 24*8 = 192 samples
        assert len(np.unique(toks)) > 50  # argmax path would give {0}
        counts = np.bincount(toks, minlength=130)
        assert counts.max() <= 12  # no token dominates a uniform draw
