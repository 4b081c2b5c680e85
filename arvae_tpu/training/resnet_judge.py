"""External MNIST digit judge: Flax ResNet-18 (reference
``imagevae/mnist_resnet.py`` + ``test_mnist.py``).

The reference adapts torchvision's ResNet-18 to 1-channel 28×28 input
and uses it to score digit-identity preservation of VAE
reconstructions and latent traversals
(``image_vae_trainer.py:319-368``). Here the judge is a Flax ResNet
trained by ``test_mnist.py`` (Adadelta → Adam here; Adadelta is not in
optax's core set and the judge only needs ≥96% accuracy).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from arvae_tpu.core.config import run_dir
from arvae_tpu.core.checkpoint import Checkpointer


class BasicBlock(nn.Module):
    features: int
    strides: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        residual = x
        y = nn.Conv(self.features, (3, 3), strides=self.strides,
                    padding=1, use_bias=False)(x)
        y = nn.BatchNorm(use_running_average=not train)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False)(y)
        y = nn.BatchNorm(use_running_average=not train)(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features, (1, 1), strides=self.strides,
                               use_bias=False)(x)
            residual = nn.BatchNorm(use_running_average=not train)(residual)
        return nn.relu(y + residual)


class MnistResNet(nn.Module):
    """ResNet-18 for 1-channel 28×28 digits, softmax output
    (reference mnist_resnet.py:7-19)."""

    num_classes: int = 10

    @nn.compact
    def __call__(self, x, train: bool = True):
        if x.ndim == 4 and x.shape[1] == 1:
            x = jnp.transpose(x, (0, 2, 3, 1))
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for features, strides in [
            (64, 1), (64, 1), (128, 2), (128, 1),
            (256, 2), (256, 1), (512, 2), (512, 1),
        ]:
            x = BasicBlock(features, strides)(x, train=train)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(self.num_classes)(x)
        return jax.nn.softmax(x, axis=-1)


JUDGE_REPR = "MnistRESNET"


def judge_run_dir() -> str:
    return run_dir(JUDGE_REPR)


def load_judge() -> Optional[Tuple[MnistResNet, Any]]:
    """Returns (module, variables) if a trained judge exists, else None."""
    ckpt = Checkpointer(judge_run_dir())
    if not ckpt.exists():
        return None
    model = MnistResNet()
    x = jnp.zeros((1, 1, 28, 28), jnp.float32)
    template = model.init(jax.random.key(0), x, train=False)
    variables = ckpt.restore(jax.device_get(template))
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    return model, variables


def predict_digits(judge, images: jnp.ndarray) -> jnp.ndarray:
    model, variables = judge
    probs = model.apply(variables, images, train=False)
    return jnp.argmax(probs, axis=-1)


def judge_accuracy(trainer, judge, batch_size: int = 128,
                   num_interps: int = 10) -> Dict:
    """Digit-prediction accuracy on inputs / recons / latent traversals
    (reference image_vae_trainer.py:319-368)."""
    model, variables = judge

    @jax.jit
    def _pred(images):
        probs = model.apply(variables, images, train=False)
        return jnp.argmax(probs, axis=-1)

    _, _, data_loader = trainer.dataset.data_loaders(batch_size=batch_size)
    interp_dict = trainer.metrics["interpretability"]
    state = trainer.ensure_state()
    fwd = trainer._forward_fn()

    input_acc, recons_acc, interp_acc, num_batches = 0.0, 0.0, 0.0, 0
    for sample_id, batch in enumerate(data_loader):
        inputs, digit_labels = batch[0], batch[1]
        inputs_j = jnp.asarray(np.asarray(inputs, np.float32))
        labels = np.asarray(digit_labels)
        key = jax.random.fold_in(jax.random.key(0), sample_id)
        out = fwd(state.params, inputs_j, key)
        recons = jax.nn.sigmoid(out.logits)
        pred_in = np.asarray(_pred(inputs_j))
        pred_rec = np.asarray(_pred(recons))
        input_acc += float(np.mean(pred_in == labels))
        recons_acc += float(np.mean(pred_rec == labels))

        z = np.asarray(out.z_tilde)
        z_rep = np.tile(z, (num_interps, 1))
        x1 = np.linspace(-4.0, 4.0, num_interps).repeat(len(z))
        dummy = 0.0
        for attr_str in interp_dict.keys():
            if attr_str == "mean":
                continue
            dim = interp_dict[attr_str][0]
            z_copy = z_rep.copy()
            z_copy[:, dim] = x1
            outputs = trainer.decode(z_copy)
            pred_out = np.asarray(_pred(jnp.asarray(outputs)))
            rep_labels = np.tile(labels, num_interps)
            dummy += float(np.mean(pred_out == rep_labels))
        n_attrs = max(len([k for k in interp_dict if k != "mean"]), 1)
        interp_acc += dummy / n_attrs
        num_batches += 1
        if sample_id >= 20:  # cap judge sweep cost
            break
    nb = max(num_batches, 1)
    return {
        "digit_pred_acc": {
            "inputs": input_acc / nb,
            "recons": recons_acc / nb,
            "interp": interp_acc / nb,
        }
    }
