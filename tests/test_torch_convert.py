"""Torch→Flax weight-conversion parity: reference-architecture torch
modules and converted Flax models must produce identical outputs."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
from torch import nn as tnn

from arvae_tpu.models import DspritesVAE, MnistVAE
from arvae_tpu.models.measure_vae import MeasureVAE
from arvae_tpu.utils.torch_convert import (
    convert_dsprites_vae,
    convert_measure_vae,
    convert_mnist_vae,
    torch_state_dict_to_numpy,
)


# -- reference-architecture torch modules (layer names/topology from
# imagevae/mnist_vae.py:16-47 & dsprites_vae.py:12-46) -----------------------


class TorchMnistVAE(tnn.Module):
    def __init__(self):
        super().__init__()
        self.enc_conv = tnn.Sequential(
            tnn.Conv2d(1, 64, 4, 1), tnn.SELU(), tnn.Dropout(0.5),
            tnn.Conv2d(64, 64, 4, 1), tnn.SELU(), tnn.Dropout(0.5),
            tnn.Conv2d(64, 8, 4, 1), tnn.SELU(), tnn.Dropout(0.5),
        )
        self.enc_lin = tnn.Sequential(tnn.Linear(2888, 256), tnn.SELU())
        self.enc_mean = tnn.Linear(256, 16)
        self.enc_log_std = tnn.Linear(256, 16)
        self.dec_lin = tnn.Sequential(
            tnn.Linear(16, 256), tnn.SELU(), tnn.Linear(256, 2888), tnn.SELU()
        )
        self.dec_conv = tnn.Sequential(
            tnn.ConvTranspose2d(8, 64, 4, 1), tnn.SELU(), tnn.Dropout(0.5),
            tnn.ConvTranspose2d(64, 64, 4, 1), tnn.SELU(), tnn.Dropout(0.5),
            tnn.ConvTranspose2d(64, 1, 4, 1),
        )

    def encode(self, x):
        h = self.enc_conv(x).view(x.size(0), -1)
        h = self.enc_lin(h)
        return self.enc_mean(h), self.enc_log_std(h)

    def decode(self, z):
        h = self.dec_lin(z).view(z.size(0), 8, 19, 19)
        return self.dec_conv(h)


class TorchDspritesVAE(tnn.Module):
    def __init__(self):
        super().__init__()
        self.enc_conv = tnn.Sequential(
            tnn.Conv2d(1, 32, 4, 2, 1), tnn.ReLU(True),
            tnn.Conv2d(32, 32, 4, 2, 1), tnn.ReLU(True),
            tnn.Conv2d(32, 32, 4, 2, 1), tnn.ReLU(True),
            tnn.Conv2d(32, 32, 4, 2, 1), tnn.ReLU(True),
        )
        self.enc_lin = tnn.Sequential(
            tnn.Linear(512, 256), tnn.ReLU(True),
            tnn.Linear(256, 256), tnn.ReLU(True),
        )
        self.enc_mean = tnn.Linear(256, 10)
        self.enc_log_std = tnn.Linear(256, 10)
        self.dec_lin = tnn.Sequential(
            tnn.Linear(10, 256), tnn.ReLU(True),
            tnn.Linear(256, 256), tnn.ReLU(True),
            tnn.Linear(256, 512), tnn.ReLU(True),
        )
        self.dec_conv = tnn.Sequential(
            tnn.ConvTranspose2d(32, 32, 4, 2, 1), tnn.ReLU(True),
            tnn.ConvTranspose2d(32, 32, 4, 2, 1), tnn.ReLU(True),
            tnn.ConvTranspose2d(32, 32, 4, 2, 1), tnn.ReLU(True),
            tnn.ConvTranspose2d(32, 1, 4, 2, 1),
        )

    def encode(self, x):
        h = self.enc_conv(x).view(x.size(0), -1)
        h = self.enc_lin(h)
        return self.enc_mean(h), self.enc_log_std(h)

    def decode(self, z):
        h = self.dec_lin(z).view(z.size(0), 32, 4, 4)
        return self.dec_conv(h)


class TestImageConversion:
    def test_mnist_encode_decode_parity(self):
        torch.manual_seed(0)
        t = TorchMnistVAE().eval()
        params = convert_mnist_vae(
            torch_state_dict_to_numpy(t.state_dict())
        )
        f = MnistVAE()
        rng = np.random.RandomState(0)
        x = rng.rand(3, 1, 28, 28).astype(np.float32)
        with torch.no_grad():
            tm, ts = t.encode(torch.from_numpy(x))
        fm, fs = f.apply({"params": params}, jnp.asarray(x), train=False,
                         method="encode")
        np.testing.assert_allclose(np.asarray(fm), tm.numpy(), atol=2e-4)
        np.testing.assert_allclose(np.asarray(fs), ts.numpy(), atol=2e-4)

        z = rng.randn(3, 16).astype(np.float32)
        with torch.no_grad():
            td = t.decode(torch.from_numpy(z)).numpy()
        fd = f.apply({"params": params}, jnp.asarray(z), train=False,
                     method="decode")
        np.testing.assert_allclose(np.asarray(fd), td, atol=2e-4)

    def test_dsprites_encode_decode_parity(self):
        torch.manual_seed(1)
        t = TorchDspritesVAE().eval()
        params = convert_dsprites_vae(
            torch_state_dict_to_numpy(t.state_dict())
        )
        f = DspritesVAE()
        rng = np.random.RandomState(1)
        x = (rng.rand(2, 1, 64, 64) > 0.5).astype(np.float32)
        with torch.no_grad():
            tm, ts = t.encode(torch.from_numpy(x))
        fm, fs = f.apply({"params": params}, jnp.asarray(x), train=False,
                         method="encode")
        np.testing.assert_allclose(np.asarray(fm), tm.numpy(), atol=2e-4)
        np.testing.assert_allclose(np.asarray(fs), ts.numpy(), atol=2e-4)

        z = rng.randn(2, 10).astype(np.float32)
        with torch.no_grad():
            td = t.decode(torch.from_numpy(z)).numpy()
        fd = f.apply({"params": params}, jnp.asarray(z), train=False,
                     method="decode")
        np.testing.assert_allclose(np.asarray(fd), td, atol=2e-4)


# -- MeasureVAE ---------------------------------------------------------------


class TorchEncoder(tnn.Module):
    """Reference measurevae/encoder.py:8-53 topology."""

    def __init__(self, V=30, E=10, H=16, L=2, Z=8):
        super().__init__()
        self.lstm = tnn.GRU(E, H, num_layers=L, bidirectional=True,
                            batch_first=True, dropout=0.5)
        self.note_embedding_layer = tnn.Embedding(V, E)
        self.linear_mean = tnn.Sequential(
            tnn.Linear(H * 2 * L, H * 2), tnn.SELU(), tnn.Linear(H * 2, Z)
        )
        self.linear_log_std = tnn.Sequential(
            tnn.Linear(H * 2 * L, H * 2), tnn.SELU(), tnn.Linear(H * 2, Z)
        )
        self.H, self.L = H, L

    def forward(self, score):
        B = score.size(0)
        emb = self.note_embedding_layer(score)
        h0 = torch.zeros(self.L * 2, B, self.H)
        _, hidden = self.lstm(emb, h0)
        hidden = hidden.transpose(0, 1).contiguous().view(B, -1)
        return self.linear_mean(hidden), self.linear_log_std(hidden)


class TorchHierDecoder(tnn.Module):
    """Reference measurevae/decoder.py:309-525 topology (argmax path)."""

    def __init__(self, V=30, E=10, H=16, L=2, Z=8):
        super().__init__()
        self.note_embedding_layer = tnn.Embedding(V, E)
        self.z_to_beat_rnn_input = tnn.Sequential(tnn.Linear(Z, H * L),
                                                  tnn.SELU())
        self.b_0 = tnn.Parameter(torch.zeros(1))
        self.rnn_beat = tnn.GRU(1, H, num_layers=L, batch_first=True,
                                dropout=0.5)
        self.beat_emb_to_tick_rnn_hidden = tnn.Sequential(
            tnn.Linear(H, H * L), tnn.SELU())
        self.beat_emb_to_tick_rnn_input = tnn.Sequential(
            tnn.Linear(H, H), tnn.SELU())
        self.x_0 = tnn.Parameter(torch.zeros(E))
        self.rnn_tick = tnn.GRU(E + H, H, num_layers=L, batch_first=True,
                                dropout=0.5)
        self.tick_emb_to_note_emb = tnn.Sequential(tnn.Linear(H, V),
                                                   tnn.ReLU())
        self.H, self.L, self.E, self.V = H, L, E, V

    def forward(self, z):
        B = z.size(0)
        h = self.z_to_beat_rnn_input(z).view(B, self.L, self.H)
        h = h.transpose(0, 1).contiguous()
        beat_in = self.b_0.unsqueeze(0).expand(B, 4, 1)
        beat_out, _ = self.rnn_beat(beat_in, h)
        weights, samples = [], []
        tick_in = self.x_0.unsqueeze(0).expand(B, self.E).unsqueeze(1)
        for i in range(4):
            hid = self.beat_emb_to_tick_rnn_hidden(beat_out[:, i, :])
            hid = hid.view(B, self.L, self.H).transpose(0, 1).contiguous()
            beat_emb = self.beat_emb_to_tick_rnn_input(
                beat_out[:, i, :]).unsqueeze(1)
            for j in range(6):
                x = torch.cat((tick_in, beat_emb), 2)
                out, hid = self.rnn_tick(x, hid)
                probs = self.tick_emb_to_note_emb(out[:, 0, :])
                idx = probs.detach().topk(1, dim=1)[1]
                tick_in = self.note_embedding_layer(idx)
                weights.append(probs[:, None, :])
                samples.append(idx[:, 0])
        return torch.cat(weights, 1), torch.stack(samples, 1)


class TestMeasureConversion:
    def test_encoder_parity(self):
        torch.manual_seed(2)
        V, E, H, L, Z = 30, 10, 16, 2, 8
        te = TorchEncoder(V, E, H, L, Z).eval()
        td = TorchHierDecoder(V, E, H, L, Z).eval()
        sd = {}
        sd.update({f"encoder.{k}": v for k, v in
                   torch_state_dict_to_numpy(te.state_dict()).items()})
        sd.update({f"decoder.{k}": v for k, v in
                   torch_state_dict_to_numpy(td.state_dict()).items()})
        params = convert_measure_vae(sd, num_layers=L)

        f = MeasureVAE(num_notes=V, note_embedding_dim=E,
                       encoder_hidden_size=H, decoder_hidden_size=H,
                       num_encoder_layers=L, num_decoder_layers=L,
                       latent_space_dim=Z)
        rng = np.random.RandomState(2)
        score = rng.randint(0, V, (3, 24)).astype(np.int32)
        with torch.no_grad():
            tm, ts = te(torch.from_numpy(score.astype(np.int64)))
        fm, fs = f.apply({"params": params}, jnp.asarray(score), train=False,
                         method="encode")
        np.testing.assert_allclose(np.asarray(fm), tm.numpy(), atol=3e-4)
        np.testing.assert_allclose(np.asarray(fs), ts.numpy(), atol=3e-4)

        # decoder parity: argmax sampling path, no teacher forcing
        z = rng.randn(3, Z).astype(np.float32)
        with torch.no_grad():
            tw, tsamp = td(torch.from_numpy(z))
        fw, fsamp = f.apply(
            {"params": params}, jnp.asarray(z),
            jnp.zeros((3, 24), jnp.int32), train=False,
            key=jax.random.key(0), method="decode",
        )
        np.testing.assert_allclose(np.asarray(fw), tw.numpy(), atol=3e-4)
        np.testing.assert_array_equal(np.asarray(fsamp), tsamp.numpy())
