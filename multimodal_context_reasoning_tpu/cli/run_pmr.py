"""PMR trainer entry point (run_PMR_ModCR.py parity).

Usage (reference README.md:22-26 analogue)::

    python -m multimodal_context_reasoning_tpu.cli.run_pmr --do_train \
        --train_file pmr_data/train-ori.jsonl --val_file pmr_data/val-ori.jsonl \
        --img_feat_file pmr_feats.pkl --output_dir output/pmr

    python -m multimodal_context_reasoning_tpu.cli.run_pmr --do_test \
        --test_file pmr_data/test-ori.jsonl --img_feat_file pmr_feats.pkl \
        --eval_model_dir output/pmr
"""

from __future__ import annotations

import os

import jax
import numpy as np

from multimodal_context_reasoning_tpu.cli.common import (
    batch_spec,
    build_arg_parser,
    configs_from_args,
    load_image_features,
    load_tokenizers,
    write_test_predictions,
)
from multimodal_context_reasoning_tpu.data.loader import DataLoader
from multimodal_context_reasoning_tpu.data.pmr import PMRDataset, load_pmr_jsonl
from multimodal_context_reasoning_tpu.models.modcr import ModCRModel
from multimodal_context_reasoning_tpu.parallel.mesh import make_mesh
from multimodal_context_reasoning_tpu.train.step import make_eval_step
from multimodal_context_reasoning_tpu.train.trainer import Trainer, _device_batch
from multimodal_context_reasoning_tpu.utils.logging import setup_logger
from multimodal_context_reasoning_tpu.utils.misc import mkdir, set_seed

DATASET_CLS = PMRDataset
LOAD_FN = load_pmr_jsonl
TASK = "pmr"


def make_dataset(args, cfg, files, feats, tokenizers):
    bert, rob = tokenizers
    limit = args.limit or None
    return DATASET_CLS(
        LOAD_FN(files, limit=limit), feats, bert, rob,
        spec=batch_spec(cfg), max_chunks=cfg.max_chunks,
    )


def main(argv=None, *, task=TASK, dataset_cls=None, load_fn=None):
    global DATASET_CLS, LOAD_FN
    if dataset_cls is not None:
        DATASET_CLS = dataset_cls
    if load_fn is not None:
        LOAD_FN = load_fn

    args = build_arg_parser(task).parse_args(argv)
    from multimodal_context_reasoning_tpu.cli.common import maybe_init_distributed

    maybe_init_distributed(args)
    mkdir(args.output_dir)
    logger = setup_logger(f"modcr.{task}", args.output_dir)
    set_seed(args.seed)

    cfg, tcfg = configs_from_args(args)
    # restore_training_settings analogue (run_PMR_ModCR.py:370-400): when
    # evaluating a saved run, its config.json overrides the geometry flags
    # so shapes match the checkpoint.
    if args.eval_model_dir and not args.do_train:
        cfg_path = os.path.join(args.eval_model_dir, "config.json")
        if os.path.exists(cfg_path):
            from multimodal_context_reasoning_tpu.core.config import ModCRConfig

            with open(cfg_path) as f:
                cfg = ModCRConfig.from_json(f.read())
            logger.info("restored model config from %s", cfg_path)
    n_model = max(args.mesh_model, 1)
    n_data = args.mesh_data or (len(jax.devices()) // n_model)
    # an explicit --mesh_data smaller than the device count runs on the
    # first n_data*n_model devices (the rest stay idle)
    mesh_devices = jax.devices()[: n_data * n_model]
    mesh = (
        make_mesh((n_data, n_model), devices=mesh_devices)
        if n_data * n_model > 1 else None
    )
    logger.info("devices=%s mesh=(%d,%d)", jax.devices(), n_data, n_model)
    if mesh is not None:
        # every batch axis (examples AND the 4x candidate rows) shards over
        # the data axis; examples must divide it or pjit fails mid-train
        # with an opaque divisibility error
        for flag, val in (("per_gpu_train_batch_size",
                           args.per_gpu_train_batch_size),
                          ("per_gpu_eval_batch_size",
                           args.per_gpu_eval_batch_size)):
            if val % n_data:
                raise SystemExit(
                    f"--{flag}={val} must be divisible by the data-mesh "
                    f"size {n_data} (pass --mesh_data to shrink the mesh)"
                )

    feats = load_image_features(
        args.img_feat_file, cfg.global_encoder.img_feature_dim
    )
    tokenizers = load_tokenizers(args, cfg)
    model = ModCRModel(cfg)

    device_table = None
    if args.device_features:
        from multimodal_context_reasoning_tpu.data.device_table import (
            DeviceFeatureTable,
        )

        # works off a dict or the native FeatureStore (keys + __getitem__)
        device_table = DeviceFeatureTable.for_config(feats, cfg)
        if mesh is not None and jax.process_count() == 1:
            # replicate once; multi-host runs lift through global_batch
            device_table.place(mesh)
        logger.info(
            "device feature table resident: %d images, %.1f MB HBM",
            len(device_table.row), device_table.nbytes / 1e6,
        )

    def maybe_import_reference_weights(params):
        """Graft reference torch checkpoints when any --*_ckpt is given
        (run_PMR_ModCR.py:709-835 load sequence)."""
        if not any((args.oscar_ckpt, args.chunkalign_ckpt,
                    args.roberta_ckpt, args.modcr_ckpt)):
            return params
        import jax as _jax
        import numpy as _np

        from multimodal_context_reasoning_tpu.interop.assemble import (
            assemble_from_files,
        )

        params = _jax.tree_util.tree_map(_np.asarray, params)
        # the graft addresses per-layer names; a scanned tower converts
        # through the stacked<->per-layer adapters around it
        scanned = cfg.roberta.scan_layers
        if scanned:
            from multimodal_context_reasoning_tpu.models.roberta import (
                stack_layer_params,
                unstack_layer_params,
            )

            nl = cfg.roberta.num_hidden_layers
            params = dict(params)
            params["params"] = dict(params["params"])
            params["params"]["roberta"] = unstack_layer_params(
                params["params"]["roberta"], nl)
        report = assemble_from_files(
            params, cfg,
            oscar_path=args.oscar_ckpt or None,
            chunkalign_path=args.chunkalign_ckpt or None,
            roberta_path=args.roberta_ckpt or None,
            modcr_path=args.modcr_ckpt or None,
            cold_start=args.cold_start,
        )
        logger.info("imported reference weights (cold_start=%s): %s",
                    args.cold_start, report.summary())
        for key, reason in sorted(report.skipped.items()):
            logger.debug("skipped %s: %s", key, reason)
        if scanned:
            params["params"]["roberta"] = stack_layer_params(
                params["params"]["roberta"], nl)
        return params

    if args.do_train:
        train_ds = make_dataset(args, cfg, args.train_file, feats, tokenizers)
        val_ds = (
            make_dataset(args, cfg, args.val_file, feats, tokenizers)
            if args.val_file else None
        )
        if device_table is not None:
            train_ds.use_device_table(device_table)
            if val_ds is not None:
                val_ds.use_device_table(device_table)
        train_dl = DataLoader(
            train_ds, args.per_gpu_train_batch_size, shuffle=True,
            seed=args.seed, drop_last=True,
            shard=(jax.process_index(), jax.process_count())
            if jax.process_count() > 1 else None,
        )
        val_dl = (
            DataLoader(
                val_ds, args.per_gpu_eval_batch_size,
                # shard eval too: unsharded, every process would feed the
                # IDENTICAL full val set through the lifted global batch —
                # P× redundant compute (accuracy unchanged); example_mask
                # plus the loader's rank-symmetric batch count handle
                # uneven tails
                shard=(jax.process_index(), jax.process_count())
                if jax.process_count() > 1 else None,
            )
            if val_ds else None
        )
        # one-time layout check for the vision-prefix dedup (the model
        # applies it inside jit and cannot validate the batch layout)
        from multimodal_context_reasoning_tpu.data.collate import (
            assert_dedup_invariant,
        )

        if cfg.dedup_vision_prefix:
            assert_dedup_invariant(next(iter(train_dl)), cfg.num_labels)
        trainer = Trainer(
            model, tcfg, train_dl, val_dl, mesh=mesh,
            checkpoint_dir=os.path.join(args.output_dir, "ckpt"),
            logger=logger,
            freeze_roberta_body=(task == "vcr"),  # run_vcr_ModCR.py:783-787
            profile_dir=args.profile_dir or None,
            profile_start=2 if args.tiny else 10,
            tensorboard_dir=args.tensorboard_dir or None,
        )
        from multimodal_context_reasoning_tpu.train.checkpoint import save_config

        save_config(args.output_dir, "config.json", cfg)
        state = trainer.init_state()
        state = state.replace(
            params=maybe_import_reference_weights(state.params)
        )
        state = trainer.fit(state)
        logger.info("training done: best val acc %.4f", trainer.best_acc)
        return state

    if args.do_test:
        test_ds = make_dataset(args, cfg, args.test_file, feats, tokenizers)
        if device_table is not None:
            test_ds.use_device_table(device_table)
        # NOTE: --do_test stays unsharded by design — it gathers per-example
        # logits for the prediction file on the host (write_test_predictions
        # needs every row locally); multi-host test runs are not a
        # reference behavior (its test() is single-device).
        test_dl = DataLoader(test_ds, args.per_gpu_eval_batch_size)
        eval_step = make_eval_step(model, mesh=mesh)

        # init params, then restore the checkpoint if given
        sample = next(iter(test_dl))
        if cfg.dedup_vision_prefix:
            from multimodal_context_reasoning_tpu.data.collate import (
                assert_dedup_invariant,
            )

            assert_dedup_invariant(sample, cfg.num_labels)
        import jax.numpy as jnp

        from multimodal_context_reasoning_tpu.train.step import _model_inputs

        # _model_inputs expands the device-table gather (and strips
        # example_mask) so init sees the model's real input schema
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0),
            _model_inputs({k: jnp.asarray(v) for k, v in sample.items()}),
        )
        params = maybe_import_reference_weights(params)
        if args.eval_model_dir:
            from multimodal_context_reasoning_tpu.train.checkpoint import (
                CheckpointManager,
            )

            # params-only, best-metric checkpoint (run_PMR_ModCR.py:236-239
            # deploys the best-accuracy save); a template restore would
            # break whenever the eval invocation's optimizer flags differ
            # from the training run's (scheduler/accum change the
            # opt_state tree)
            params = CheckpointManager(
                os.path.join(args.eval_model_dir, "ckpt")
            ).restore_params(best=True)
            # commit the host-numpy restore once — jit doesn't cache numpy
            # args, so the per-batch eval_step below would otherwise
            # re-ship the full param tree on every batch
            params = jax.device_put(params)

        all_logits = []
        correct = count = 0.0
        for batch in test_dl:
            out = eval_step(params, _device_batch(batch))
            keep = batch["example_mask"] > 0
            all_logits.append(np.asarray(out["logits"])[keep])
            correct += float(out["correct"])
            count += float(out["count"])
        logits = np.concatenate(all_logits, axis=0)
        acc = correct / max(count, 1.0)
        logger.info("test accuracy: %.4f over %d examples", acc, int(count))
        out_path = os.path.join(
            args.output_dir, f"result_test_ModICR_{task}.json"
        )
        write_test_predictions(out_path, test_ds.examples, logits)
        logger.info("wrote %s", out_path)
        return acc

    raise SystemExit("pass --do_train or --do_test")


if __name__ == "__main__":
    main()
