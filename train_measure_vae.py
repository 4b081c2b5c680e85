"""Train a MeasureVAE (music AR-VAE) — CLI-compatible with the
reference ``train_measure_vae.py:13-215``.

Examples:
    python train_measure_vae.py --rand 0 -r all --num_epochs 30
    python train_measure_vae.py -d bach --rand 0 --short
"""

import json

import click

from arvae_tpu.core.config import expand_reg_dims
from arvae_tpu.data.attributes import MUSIC_REG_TYPE
from arvae_tpu.data.bar_dataset import ChoraleNBarDataset, FolkNBarDataset
from arvae_tpu.models.measure_vae import MeasureVAE
from arvae_tpu.training.measure_trainer import MeasureVAETrainer


@click.command()
@click.option("--dataset_type", "-d", default="folk",
              help="dataset to be used, `bach` or `folk`")
@click.option("--note_embedding_dim", default=10,
              help="size of the note embeddings")
@click.option("--metadata_embedding_dim", default=2,
              help="size of the metadata embeddings (unused, API parity)")
@click.option("--num_encoder_layers", default=2,
              help="number of layers in encoder RNN")
@click.option("--encoder_hidden_size", default=128,
              help="hidden size of the encoder RNN")
@click.option("--encoder_dropout_prob", default=0.5,
              help="dropout prob between encoder RNN layers")
@click.option("--has_metadata", default=False,
              help="bool, True if data contains metadata")
@click.option("--latent_space_dim", default=32,
              help="dimension of latent space")
@click.option("--num_decoder_layers", default=2,
              help="number of layers in decoder RNN")
@click.option("--decoder_hidden_size", default=128,
              help="hidden size of the decoder RNN")
@click.option("--decoder_dropout_prob", default=0.5,
              help="dropout prob between decoder RNN layers")
@click.option("--decoder_type", default="hier",
              type=click.Choice(["hier", "sr", "sr-no-input"]),
              help="decoder variant: hierarchical (reference default), "
                   "single-RNN autoregressive, or non-autoregressive")
@click.option("--batch_size", default=256, help="training batch size")
@click.option("--num_epochs", default=30, help="number of training epochs")
@click.option("--lr", default=1e-4, help="learning rate")
@click.option("--beta", default=0.001, help="weight for the KLD loss")
@click.option("--capacity", default=0.0, help="beta-VAE capacity")
@click.option("--gamma", default=1.0, help="weight for the reg loss")
@click.option("--delta", default=10.0, help="spread parameter")
@click.option("--train/--test", "do_train", default=True,
              help="train or test the specified model")
@click.option("--log/--no_log", default=False,
              help="log the results for tensorboard")
@click.option("--resume/--no_resume", default=False,
              help="restore the run's checkpoint (params, optimizer "
                   "state, step) before training, continuing the "
                   "trajectory")
@click.option("--rand", default=None, help="random seed")
@click.option("--reg_type", "-r", default=None, multiple=True,
              help="attribute name(s) used for regularization")
@click.option("--short/--full", default=False,
              help="use the small synthetic corpus for quick runs")
@click.option("--sampling", default="argmax",
              type=click.Choice(["argmax", "multinomial"]),
              help="free-running feedback sampling in the decoder "
                   "(reference decoder.py:97 `self.sampling`)")
@click.option("--glsr/--no_glsr", "use_glsr", default=False,
              help="train with Geodesic Latent Space Regularization "
                   "instead of the AR reg loss "
                   "(reference measurevae/vae_trainer_glsr.py)")
@click.option("--skip_cached/--no_skip_cached", default=False,
              help="skip seeds whose results_dict.json already carries a "
                   "matching protocol stamp (resume a timeout-cut "
                   "multi-seed protocol run)")
def main(
    dataset_type,
    note_embedding_dim,
    metadata_embedding_dim,
    num_encoder_layers,
    encoder_hidden_size,
    encoder_dropout_prob,
    latent_space_dim,
    num_decoder_layers,
    decoder_hidden_size,
    decoder_dropout_prob,
    decoder_type,
    has_metadata,
    batch_size,
    num_epochs,
    lr,
    beta,
    capacity,
    gamma,
    delta,
    do_train,
    log,
    resume,
    rand,
    reg_type,
    short,
    sampling,
    use_glsr,
    skip_cached,
):
    num_bars = 1
    if dataset_type == "bach":
        dataset = ChoraleNBarDataset(
            dataset_type="train", is_short=short, num_bars=num_bars
        )
    elif dataset_type == "folk":
        dataset = FolkNBarDataset(
            dataset_type="train", is_short=short, num_bars=num_bars
        )
    else:
        raise ValueError("Invalid dataset_type. Choose between `folk` and `bach`")
    # Finalize the corpus BEFORE sizing the model: make_dataset can grow
    # the vocab on names outside a cached dict file's span, and the
    # embedding table must cover the grown vocabulary.
    dataset.get_dataset()

    attr_dict = MUSIC_REG_TYPE
    reg_type = tuple(reg_type or ())
    if len(reg_type) != 0:
        unknown = [r for r in reg_type if r != "all" and r not in attr_dict]
        if unknown or ("all" in reg_type and len(reg_type) != 1):
            raise click.BadParameter(
                f"unknown reg_type {unknown or list(reg_type)}; choose "
                f"from {sorted(attr_dict)} or 'all' (alone)"
            )
        # no skip names apply to the music dict, so 'all' = every value
        reg_dim = expand_reg_dims(reg_type, attr_dict)
    else:
        reg_dim = (0,)

    seeds = range(0, 10) if rand is None else [int(rand)]
    for r in seeds:
        model = MeasureVAE(
            num_notes=len(dataset.note2index_dicts),
            note_embedding_dim=note_embedding_dim,
            num_encoder_layers=num_encoder_layers,
            encoder_hidden_size=encoder_hidden_size,
            encoder_dropout_prob=encoder_dropout_prob,
            latent_space_dim=latent_space_dim,
            num_decoder_layers=num_decoder_layers,
            decoder_hidden_size=decoder_hidden_size,
            decoder_dropout_prob=decoder_dropout_prob,
            decoder_type=decoder_type,
            sampling=sampling,
        )
        if use_glsr:
            from arvae_tpu.training.glsr_trainer import MeasureVAETrainerGLSR

            # GLSR's differentiable surrogate exists for two attributes
            # (reference vae_trainer_glsr.py compute_grad_attr); the CLI
            # name note_density maps to the surrogate's num_notes.
            glsr_supported = {"rhy_complexity": "rhy_complexity",
                              "note_density": "num_notes"}
            if reg_type and reg_type[0] != "all" and (
                    len(reg_type) > 1
                    or reg_type[0] not in glsr_supported):
                raise click.BadParameter(
                    "--glsr takes a single reg type with a differentiable"
                    f" surrogate: {sorted(glsr_supported)}"
                )
            if reg_type and reg_type[0] == "all" and len(reg_type) > 1:
                # 'all' followed by explicit names would silently drop
                # the explicit request on the defaulting branch below
                raise click.BadParameter(
                    "--glsr: pass either -r all or a single supported "
                    "reg type, not both"
                )
            if not reg_type or reg_type[0] == "all":
                click.echo("--glsr regularizes one attribute; "
                           "defaulting to rhy_complexity")
                chosen = "rhy_complexity"
            else:
                chosen = reg_type[0]
            trainer = MeasureVAETrainerGLSR(
                dataset=dataset,
                model=model,
                lr=lr,
                reg_type=glsr_supported[chosen],
                reg_dim=attr_dict[chosen],
                beta=beta,
                gamma=gamma,
                rand=r,
            )
        else:
            trainer = MeasureVAETrainer(
                dataset=dataset,
                model=model,
                lr=lr,
                reg_type=reg_type,
                reg_dim=reg_dim,
                beta=beta,
                capacity=capacity,
                gamma=gamma,
                delta=delta,
                rand=r,
            )

        # One machine-greppable line per run: sweep drivers locate the
        # results cache from this instead of re-deriving the naming.
        print("run_dir:", trainer.run_dir, flush=True)

        if skip_cached and do_train and trainer.has_protocol_cache(
            num_epochs, batch_size
        ):
            print(f"skip seed {r}: protocol-stamped cache in "
                  f"{trainer.run_dir}")
            continue
        if resume:
            trainer.maybe_resume()
        if do_train:
            trainer.train_model(batch_size=batch_size, num_epochs=num_epochs,
                                log=log)
        else:
            trainer.load_model()

        trainer.writer = None
        metrics = trainer.compute_eval_metrics()
        print(json.dumps(metrics, indent=2))

        _, _, data_loader = trainer.dataset.data_loaders(batch_size=1)
        latent_codes, _, _ = trainer.compute_representations(
            data_loader=data_loader, num_batches=20
        )
        for attr in trainer.attr_dict.keys():
            trainer.plot_latent_interpolations(
                latent_codes, attr_str=attr, num_points=5
            )


if __name__ == "__main__":
    main()
