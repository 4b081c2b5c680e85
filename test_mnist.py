"""Trains the MNIST digit-identity ResNet judge (reference
``test_mnist.py:29-91``): 5 epochs on MNIST, per-epoch
precision/recall/F1/accuracy, checkpoints saved under
models/MnistRESNET/. The resulting judge is consumed by
``ImageVAETrainer.get_resnet_accuracy``."""

import time

import click
import jax
import jax.numpy as jnp
import numpy as np
import optax
from sklearn.metrics import (
    accuracy_score,
    f1_score,
    precision_score,
    recall_score,
)

from arvae_tpu.core.checkpoint import Checkpointer
from arvae_tpu.data.mnist import MnistDataset
from arvae_tpu.parallel import create_mesh, shard_batch_truncated
from arvae_tpu.training.resnet_judge import MnistResNet, judge_run_dir


@click.command()
@click.option("--batch_size", default=256)
@click.option("--num_epochs", default=5)
@click.option("--lr", default=0.5, help="adadelta learning rate")
@click.option("--augment/--no_augment", default=False,
              help="random ±2px translations during training (judge "
                   "accuracy-vs-budget isolation, VERDICT r3 item 8)")
def main(batch_size, num_epochs, lr, augment):
    start_time = time.time()
    dataset = MnistDataset()
    ctx = create_mesh()
    model = MnistResNet()

    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 1, 28, 28), jnp.float32), train=True
    )
    params, batch_stats = variables["params"], variables["batch_stats"]
    try:
        optimizer = optax.adadelta(lr)
    except AttributeError:  # older optax without adadelta
        print("warning: optax.adadelta unavailable; training the judge "
              "with adam(1e-3) — the --lr value is NOT applied (adadelta "
              "and adam learning rates are not comparable)")
        optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)

    params = jax.device_put(params, ctx.replicated)
    batch_stats = jax.device_put(batch_stats, ctx.replicated)
    opt_state = jax.device_put(opt_state, ctx.replicated)

    def random_shift(images, key):
        """Per-image random ±2px translation (pad + vmapped crop)."""
        pad = jnp.pad(images, ((0, 0), (0, 0), (2, 2), (2, 2)))
        off = jax.random.randint(key, (images.shape[0], 2), 0, 5)

        def crop(img, o):
            return jax.lax.dynamic_slice(img, (0, o[0], o[1]), (1, 28, 28))

        return jax.vmap(crop)(pad, off)

    @jax.jit
    def train_step(params, batch_stats, opt_state, images, labels, key):
        if augment:
            images = random_shift(images, key)

        def loss_fn(p):
            probs, updates = model.apply(
                {"params": p, "batch_stats": batch_stats},
                images, train=True, mutable=["batch_stats"],
            )
            logp = jnp.log(jnp.clip(probs, 1e-8))
            nll = -jnp.take_along_axis(logp, labels[:, None], axis=1).mean()
            return nll, updates["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, loss

    @jax.jit
    def predict(params, batch_stats, images):
        probs = model.apply(
            {"params": params, "batch_stats": batch_stats}, images,
            train=False,
        )
        return jnp.argmax(probs, axis=-1)

    gen_train, gen_val, _ = dataset.data_loaders(batch_size)
    ckpt = Checkpointer(judge_run_dir())
    base_key = jax.random.key(0)
    for epoch in range(num_epochs):
        loss = None
        for batch_num, (images, labels) in enumerate(gen_train):
            sharded = shard_batch_truncated(
                ctx, (np.asarray(images, np.float32),
                      np.asarray(labels, np.int32))
            )
            if sharded is None:  # final partial batch smaller than mesh
                continue
            images, labels = sharded
            params, batch_stats, opt_state, loss = train_step(
                params, batch_stats, opt_state, images, labels,
                jax.random.fold_in(base_key, epoch * 100003 + batch_num),
            )
        if loss is None:
            raise click.ClickException(
                f"every batch was smaller than the {ctx.n_data}-device "
                "data axis; raise --batch_size"
            )
        preds, gts = [], []
        for images, labels in gen_val:
            p = predict(params, batch_stats,
                        jnp.asarray(np.asarray(images, np.float32)))
            preds.append(np.asarray(p))
            gts.append(np.asarray(labels))
        preds = np.concatenate(preds)
        gts = np.concatenate(gts)
        print(
            f"epoch {epoch + 1}/{num_epochs}  loss {float(loss):.4f}  "
            f"precision {precision_score(gts, preds, average='macro', zero_division=0):.4f}  "
            f"recall {recall_score(gts, preds, average='macro', zero_division=0):.4f}  "
            f"f1 {f1_score(gts, preds, average='macro', zero_division=0):.4f}  "
            f"accuracy {accuracy_score(gts, preds):.4f}"
        )
        ckpt.save({"params": params, "batch_stats": batch_stats})
    print(f"total time: {time.time() - start_time:.1f}s")


if __name__ == "__main__":
    main()
