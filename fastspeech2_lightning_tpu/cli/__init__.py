"""Command-line interface.

Same surface as the reference's typer app (fs2/cli/cli.py:15-54):
`benchmark, preprocess, synthesize, train` plus `check-data`, with the
everyvoice-style `--config-args/-c key.path=value` dotted overrides
(demonstrated at fs2/tests/test_cli.py:114-128). Built on click (typer is not
in the image); invoke as `python -m fastspeech2_lightning_tpu <cmd>`."""

from __future__ import annotations

from pathlib import Path

import click


@click.group(
    help="A TPU-native FastSpeech2 text-to-spec framework "
    "(JAX/XLA/Pallas). Subcommands mirror fs2l."
)
def app():
    pass


_config_args_option = click.option(
    "--config-args",
    "-c",
    "config_args",
    multiple=True,
    help="Dotted-path config overrides, e.g. -c training.batch_size=8",
)


@app.command(help="Preprocess audio/spec/attn/text/pitch/energy artifacts + stats.")
@click.argument("config_file", type=click.Path(exists=True, path_type=Path))
@click.option(
    "--steps",
    "-s",
    multiple=True,
    type=click.Choice(["audio", "spec", "attn", "text", "pitch", "energy"]),
    help="Subset of preprocessing steps (default: all).",
)
@click.option("--cpus", type=int, default=None, help="Worker processes.")
@click.option(
    "--on-device-spec/--host-spec",
    default=False,
    help="Compute mel+energy as fused batched ops on the accelerator.",
)
@_config_args_option
def preprocess(config_file: Path, steps, cpus, on_device_spec, config_args):
    from ..config import load_config_base_command
    from ..preprocessing import Preprocessor

    config = load_config_base_command(config_file, list(config_args))
    pre = Preprocessor(config)
    result = pre.run(
        steps=steps or ("audio", "spec", "attn", "text", "pitch", "energy"),
        cpus=cpus,
        on_device_spec=on_device_spec,
    )
    click.echo(
        f"Preprocessed {result['n_train']} training + {result['n_val']} "
        f"validation utterances -> {config.preprocessing.save_dir}"
    )


@app.command(help="Train a text-to-spec model.")
@click.argument("config_file", type=click.Path(exists=True, path_type=Path))
@_config_args_option
@click.option("--max-steps", type=int, default=None)
@click.option("--resume/--no-resume", default=True)
@click.option(
    "--model-parallel", type=int, default=1,
    help="Tensor-parallel axis size (devices per model shard).",
)
@click.option(
    "--distributed/--no-distributed", default=False,
    help="Call jax.distributed.initialize() for multi-host meshes.",
)
def train(config_file: Path, config_args, max_steps, resume, model_parallel, distributed):
    if distributed:
        import os

        import jax

        # cluster environments (GKE/SLURM/TPU pods) are auto-detected by
        # initialize(); manual launches pass the coordinator explicitly
        kwargs = {}
        if os.environ.get("FS2T_COORDINATOR_ADDRESS"):
            kwargs = dict(
                coordinator_address=os.environ["FS2T_COORDINATOR_ADDRESS"],
                num_processes=int(os.environ["FS2T_NUM_PROCESSES"]),
                process_id=int(os.environ["FS2T_PROCESS_ID"]),
            )
        jax.distributed.initialize(**kwargs)
    from ..config import load_config_base_command
    from ..training.loop import Trainer
    from ..utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    config = load_config_base_command(config_file, list(config_args))
    trainer = Trainer(config, model_parallel=model_parallel)
    trainer.fit(max_steps=max_steps, resume=resume)


@app.command(
    "train-vocoder",
    help="Train a HiFiGAN vocoder on the preprocessed corpus (spec-to-wav; "
    "the reference stack needs a separate torch repo for this). Writes "
    "vocoder.npz usable directly via --vocoder-path.",
)
@click.argument("config_file", type=click.Path(exists=True, path_type=Path))
@_config_args_option
@click.option("--max-steps", type=int, default=None)
@click.option("--resume/--no-resume", default=True)
@click.option("--batch-size", type=int, default=16)
@click.option("--frames-per-crop", type=int, default=32,
              help="Mel frames per training crop (x hop = samples).")
@click.option("--learning-rate", type=float, default=2e-4)
@click.option("--ckpt-steps", type=int, default=5000)
@click.option(
    "--data-parallel", type=int, default=None,
    help="Shard crop batches over the first N chips (gradient all-reduce "
    "inserted by XLA GSPMD).",
)
@click.option(
    "--finetune-from", type=click.Path(exists=True, path_type=Path),
    default=None,
    help="Initialize the generator from an existing vocoder checkpoint "
    "(.ckpt torch or .npz); discriminators start fresh.",
)
@click.option(
    "--finetune-mels", type=click.Path(exists=True, path_type=Path),
    default=None,
    help="Train on acoustic-model-predicted mels: a directory produced by "
    "`synthesize -O spec --teacher-forcing-directory <preprocessed>` "
    "(adapts the vocoder to inference-time mels).",
)
@click.option(
    "--precision",
    type=click.Choice(["bfloat16", "float32"]), default="bfloat16",
    help="Conv compute dtype for the D+G step (params/losses/optimizers "
    "stay float32). bfloat16 is ~1.2x faster per step on TPU.",
)
def train_vocoder_cmd(config_file, config_args, max_steps, resume,
                      batch_size, frames_per_crop, learning_rate, ckpt_steps,
                      data_parallel, finetune_from, finetune_mels, precision):
    from ..config import load_config_base_command
    from ..training.vocoder import VocoderTrainingConfig, train_vocoder
    from ..utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    config = load_config_base_command(config_file, list(config_args))
    tc = VocoderTrainingConfig(
        batch_size=batch_size, frames_per_crop=frames_per_crop,
        learning_rate=learning_rate, ckpt_steps=ckpt_steps,
        compute_dtype=precision,
    )
    train_vocoder(
        config, train_config=tc, max_steps=max_steps, resume=resume,
        data_parallel=data_parallel, finetune_from=finetune_from,
        finetune_mel_dir=finetune_mels,
    )


@app.command(
    "evaluate-vocoder",
    help="Copy-synthesis quality of a vocoder on the validation set: "
    "vocode ground-truth mels and score against the real audio "
    "(mel-L1, SI-SDR, STOI, PESQ-family proxy).",
)
@click.argument("config_file", type=click.Path(exists=True, path_type=Path))
@click.option("--vocoder-path", "-v", required=True,
              type=click.Path(exists=True, path_type=Path))
@click.option("--n-utterances", "-n", type=int, default=16)
@click.option(
    "--vocoder-precision",
    type=click.Choice(["float32", "bfloat16"]), default="float32",
)
@_config_args_option
def evaluate_vocoder_cmd(config_file, vocoder_path, n_utterances,
                         vocoder_precision, config_args):
    import json as _json

    from ..config import load_config_base_command
    from ..evaluation import evaluate_vocoder
    from ..utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    config = load_config_base_command(config_file, list(config_args))
    report = evaluate_vocoder(
        config, Path(vocoder_path), n_utterances=n_utterances,
        precision=vocoder_precision,
    )
    click.echo(_json.dumps(report, indent=2))


@app.command(help="Synthesize audio/specs/alignments from text or a filelist.")
@click.argument("model_path", type=click.Path(exists=True, path_type=Path))
@click.option("--texts", "-t", multiple=True, help="Text(s) to synthesize.")
@click.option(
    "--filelist", "-f", type=click.Path(exists=True, path_type=Path), default=None
)
@click.option(
    "--output-type",
    "-O",
    multiple=True,
    type=click.Choice(["wav", "spec", "textgrid", "readalong-xml", "readalong-html"]),
    default=("wav",),
)
@click.option("--language", "-l", default=None)
@click.option("--speaker", "-s", default=None)
@click.option(
    "--text-representation",
    type=click.Choice(["characters", "phones", "arpabet"]),
    default="characters",
    help="Which filelist column / input representation to synthesize from "
    "(fs2/cli/synthesize.py --text-representation parity; arpabet is "
    "converted through the bundled ARPABET->IPA table).",
)
@click.option("--duration-control", "-D", type=float, default=1.0)
@click.option("--pitch-control", type=float, default=1.0)
@click.option("--energy-control", type=float, default=1.0)
@click.option(
    "--vocoder-path", "-v", type=click.Path(path_type=Path), default=None
)
@click.option(
    "--vocoder-precision",
    type=click.Choice(["float32", "bfloat16"]),
    default="float32",
    help="bfloat16 runs the vocoder convs ~1.3x faster on TPU "
    "(~39 dB SNR vs float32 output).",
)
@click.option(
    "--style-reference", "-S", type=click.Path(exists=True, path_type=Path), default=None
)
@click.option(
    "--output-dir",
    "-o",
    type=click.Path(path_type=Path),
    default=Path("synthesis_output"),
)
@click.option("--batch-size", "-b", type=int, default=None)
@click.option(
    "--data-parallel", type=int, default=None,
    help="Shard each batch's rows over the first N chips (bulk corpus "
    "synthesis scales ~linearly; rows are independent).",
)
@click.option("--teacher-forcing-directory", "-T", type=click.Path(path_type=Path), default=None)
@click.option(
    "--use-ema/--no-use-ema",
    default=False,
    help="Serve the exponential-moving-average weights saved by training "
    "with training.ema_decay > 0 (beyond-reference feature).",
)
@_config_args_option
def synthesize(
    model_path: Path,
    texts,
    filelist,
    output_type,
    language,
    speaker,
    text_representation,
    duration_control,
    pitch_control,
    energy_control,
    vocoder_path,
    vocoder_precision,
    style_reference,
    output_dir,
    batch_size,
    data_parallel,
    teacher_forcing_directory,
    use_ema,
    config_args,
):
    from ..type_definitions import SynthesizeOutputFormats

    output_type = [SynthesizeOutputFormats(o) for o in output_type]
    if not texts and filelist is None:
        raise click.UsageError("You must define either --text or --filelist")
    if texts and filelist is not None:
        raise click.UsageError("Only one of --text and --filelist may be used")
    needs_vocoder = (
        SynthesizeOutputFormats.wav in output_type
        or SynthesizeOutputFormats.readalong_html in output_type
    )
    if needs_vocoder and vocoder_path is None:
        raise click.UsageError(
            "Missing --vocoder-path option. A vocoder is required for wav "
            "and readalong-html output."
        )

    from ..synthesis.prepare import prepare_data
    from ..synthesis.synthesize import load_model_from_checkpoint, synthesize_items
    from ..synthesis.writers import get_synthesis_output_writers
    from ..utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    (
        model, variables, config, stats, lang2id, speaker2id, global_step,
    ) = load_model_from_checkpoint(model_path, use_ema=use_ema)

    if config_args:
        # inference-time dotted-path overrides (inference_base_command parity)
        from ..config import FastSpeech2Config, apply_overrides

        config = FastSpeech2Config.model_validate(
            apply_overrides(config.model_checkpoint_dump(), list(config_args))
        )

    if teacher_forcing_directory is not None:
        # target specs/variances come from this preprocessed directory
        # (fs2 synthesize --teacher-forcing-directory semantics)
        config.preprocessing.save_dir = Path(teacher_forcing_directory)

    vocoder = None
    vocoder_global_step = 0
    output_hop = None
    if vocoder_path is not None:
        from ..synthesis.griffin_lim import (
            GriffinLimVocoder,
            is_griffin_lim_path,
        )

        if is_griffin_lim_path(vocoder_path):
            # `-v griffin-lim`: trainless classical fallback (no ckpt)
            vocoder = GriffinLimVocoder(config.preprocessing.audio)
            output_hop = vocoder.hop
        else:
            from ..models.hifigan import load_vocoder_checkpoint

            vocoder, vocoder_global_step, output_hop = (
                load_vocoder_checkpoint(
                    Path(vocoder_path), precision=vocoder_precision
                )
            )

    from ..config import (
        DatasetTextRepresentation,
        TargetTrainingTextRepresentationLevel,
    )

    if (
        text_representation != "characters"
        and config.model.target_text_representation_level
        == TargetTrainingTextRepresentationLevel.characters
    ):
        raise click.UsageError(
            f"--text-representation {text_representation} requires a model "
            "trained on phones (target_text_representation_level), but this "
            "checkpoint was trained on characters."
        )
    items = prepare_data(
        texts=list(texts) or None,
        language=language,
        speaker=speaker,
        filelist=filelist,
        config=config,
        stats=stats,
        lang2id=lang2id,
        speaker2id=speaker2id,
        text_representation=DatasetTextRepresentation(text_representation),
        duration_control=duration_control,
        style_reference=style_reference,
        # Teacher forcing pairs each utterance with its full preprocessed
        # target mel — chunking the text would misalign chunk durations with
        # whole-utterance targets, so it is forced off here.
        split_text=False if teacher_forcing_directory is not None else None,
    )
    writers = get_synthesis_output_writers(
        output_type, Path(output_dir), config,
        "postnet_output" if config.model.use_postnet else "output",
        global_step, vocoder=vocoder,
        vocoder_global_step=vocoder_global_step, output_hop_size=output_hop,
    )
    mesh = None
    if data_parallel is not None and data_parallel > 1:
        from ..parallel.mesh import make_mesh

        mesh = make_mesh(n_devices=data_parallel, model_parallel=1)
    synthesize_items(
        items, model, variables, config, lang2id, speaker2id, writers,
        batch_size=batch_size, mesh=mesh,
        teacher_forcing=teacher_forcing_directory is not None,
        control={
            "pitch": pitch_control,
            "energy": energy_control,
            "duration": duration_control,
        },
    )
    click.echo(f"Wrote outputs to {output_dir}")


@app.command(help="Time forward passes (training or inference mode).")
@click.argument("config_file", type=click.Path(exists=True, path_type=Path))
@click.option(
    "--benchmark-type",
    type=click.Choice(["training", "inference"]),
    default="training",
)
@click.option("--warmup-reps", type=int, default=10)
@click.option("--repetitions", type=int, default=300)
@click.option(
    "--profile-dir",
    type=click.Path(path_type=Path),
    default=None,
    help="Capture a jax.profiler trace of the timed region into this directory.",
)
@_config_args_option
def benchmark(
    config_file: Path, benchmark_type, warmup_reps, repetitions, profile_dir, config_args
):
    """Parity with fs2/cli/benchmark.py: one collated batch, warmup, timed
    reps, mean/std ms."""
    import time

    import jax
    import numpy as np

    from ..config import load_config_base_command
    from ..dataset import BucketedLoader, load_datasets
    from ..models import FastSpeech2
    from ..preprocessing.stats import load_stats
    from ..text import TextProcessor, lookuptables_from_config
    from ..utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    config = load_config_base_command(config_file, list(config_args))
    stats = load_stats(Path(config.preprocessing.save_dir) / "stats.json")
    lang2id, speaker2id = lookuptables_from_config(config)
    tp = TextProcessor(config.text)
    train_ds, _ = load_datasets(config, lang2id, speaker2id)
    loader = BucketedLoader(
        train_ds, config.training.batch_size, seed=0,
        max_mel_length=config.model.max_mel_length,
    )
    batch = next(iter(loader))
    from ..dataset import HOST_ONLY_KEYS

    device_batch = {k: v for k, v in batch.items() if k not in HOST_ONLY_KEYS}

    model = FastSpeech2(
        config=config, stats=stats, n_symbols=len(tp.symbols),
        n_speakers=max(len(speaker2id), 1), n_languages=max(len(lang2id), 1),
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        device_batch, deterministic=True,
    )
    inference = benchmark_type == "inference"

    def apply_fn(variables, batch):
        return model.apply(
            variables, batch, inference=inference, deterministic=True,
            max_target_len=config.model.max_mel_length if inference else None,
        )["output"]

    from ..utils.benchmarking import (
        chainable,
        check_mfu,
        compiled_flops,
        time_chained,
    )

    carry_key = "pitch" if "pitch" in device_batch else "mel"
    jf = jax.jit(chainable(apply_fn, carry_key))
    staged = [{k: jax.device_put(v) for k, v in device_batch.items()}]
    variables = jax.device_put(variables)
    import jax.numpy as jnp

    flops = compiled_flops(jf, variables, staged[0], jnp.float32(0.0))
    if profile_dir is not None:
        jax.profiler.start_trace(str(profile_dir))
    trials = time_chained(
        jf, variables, staged, reps=repetitions, trials=5, warmup=warmup_reps
    )
    if profile_dir is not None:
        jax.profiler.stop_trace()
        click.echo(f"Wrote profiler trace to {profile_dir}")
    per_call_ms = np.asarray(trials) / repetitions * 1000
    mfu = check_mfu(flops, float(per_call_ms.min()) / 1000)
    click.echo(
        f"Average forward pass for {benchmark_type} duration after "
        f"{repetitions} repetitions: {per_call_ms.mean():.3f} ms "
        f"Standard Deviation: {per_call_ms.std():.3f} "
        f"(best {per_call_ms.min():.3f} ms, {flops / 1e12:.3f} TFLOP/call, "
        f"MFU {mfu * 100:.1f}%; forced-completion chained timing)"
    )


@app.command("check-data", help="Dataset QA: stats, clipping, per-utterance loss scores.")
@click.argument("config_file", type=click.Path(exists=True, path_type=Path))
@click.option(
    "--filelist", "-f", type=click.Path(exists=True, path_type=Path), default=None
)
@click.option("--calculate-stats/--no-calculate-stats", default=True)
@click.option("--model-path", type=click.Path(path_type=Path), default=None,
              help="Score utterances by model loss using this checkpoint.")
@click.option("--output-dir", "-o", type=click.Path(path_type=Path),
              default=Path("checked_data"))
@click.option("--objective-evaluation/--no-objective-evaluation", default=False,
              help="SQUIM STOI/PESQ/SI-SDR metrics (requires torchaudio).")
@click.option("--clip-detection/--no-clip-detection", default=False,
              help="Thorough consecutive-run clipping detection (slower; "
              "the reference's clipdetect path).")
@_config_args_option
def check_data(config_file: Path, filelist, calculate_stats, model_path,
               output_dir, objective_evaluation, clip_detection, config_args):
    from ..config import load_config_base_command
    from ..cli.check_data import check_data_command

    config = load_config_base_command(config_file, list(config_args))
    check_data_command(
        config, filelist, calculate_stats, model_path, Path(output_dir),
        objective_evaluation=objective_evaluation,
        clip_detection=clip_detection,
    )


@app.command(
    "average-checkpoints",
    help="Uniform parameter averaging over checkpoints (serving artifact; "
    "beyond-reference feature).",
)
@click.argument("ckpt_dir", type=click.Path(exists=True, path_type=Path))
@click.option(
    "--output", "-o", type=click.Path(path_type=Path), required=True,
    help="Directory to write the averaged checkpoint to.",
)
@click.option(
    "--last", "-n", type=int, default=None,
    help="Average the N newest checkpoints (default: all under CKPT_DIR).",
)
@click.option(
    "--use-ema/--no-use-ema", default=False,
    help="Average the EMA shadows instead of the raw params.",
)
def average_checkpoints_cmd(ckpt_dir: Path, output: Path, last, use_ema):
    from ..training.checkpoint import average_checkpoints

    steps = sorted(
        (p for p in Path(ckpt_dir).glob("step=*") if p.is_dir()),
        key=lambda p: int(p.name.split("=")[1]),
    )
    if not steps:
        raise click.UsageError(f"No step=N checkpoints under {ckpt_dir}")
    if last:
        steps = steps[-last:]
    out = average_checkpoints(steps, Path(output), use_ema=use_ema)
    click.echo(f"Averaged {len(steps)} checkpoints -> {out}")


@app.command(
    "serve",
    help="Resident batch-streaming synthesis server (POST /synthesize "
    "streams wav chunk-by-chunk; GET /health). MODEL_PATH is an orbax "
    "checkpoint, a reference Lightning .ckpt, or an ahead-of-time .fs2x "
    "artifact from export-serving (no model code or jit compile). "
    "Beyond-reference feature.",
)
@click.argument("model_path", type=click.Path(exists=True, path_type=Path))
@click.option("--vocoder-path", "-v", type=click.Path(path_type=Path), default=None)
@click.option("--host", default="127.0.0.1")
@click.option("--port", type=int, default=8777)
@click.option("--max-batch", type=int, default=8,
              help="Chunks micro-batched into one device call (fixed shape).")
@click.option("--batch-window-ms", type=float, default=5.0,
              help="How long to wait for more chunks before dispatching.")
@click.option("--max-frames", type=int, default=None)
@click.option("--use-ema/--no-use-ema", default=False)
@click.option(
    "--vocoder-precision",
    type=click.Choice(["float32", "bfloat16"]),
    default="float32",
    help="bfloat16 runs the vocoder convs ~1.3x faster on TPU "
    "(~39 dB SNR vs float32 output).",
)
@click.option(
    "--data-parallel", type=int, default=None,
    help="Shard each micro-batch's rows over the first N chips "
    "(throughput scales ~linearly; rows are independent).",
)
@click.option(
    "--warmup/--no-warmup", default=False,
    help="Pre-compile every serving shape bucket before accepting requests "
    "(with the persistent compile cache, restarts warm from disk).",
)
@click.option(
    "--style-reference", "-S",
    type=click.Path(exists=True, path_type=Path), default=None,
    help="GST style-reference wav applied to every request (the model must "
    "be trained with the global-style-token module).",
)
def serve_cmd(model_path, vocoder_path, host, port, max_batch,
              batch_window_ms, max_frames, use_ema, vocoder_precision,
              data_parallel, warmup, style_reference):
    from ..serving import serve
    from ..utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    server = serve(
        model_path, vocoder_path=vocoder_path, host=host, port=port,
        max_batch=max_batch, batch_window_ms=batch_window_ms,
        max_frames=max_frames, use_ema=use_ema,
        vocoder_precision=vocoder_precision, data_parallel=data_parallel,
        warmup=warmup, style_reference=style_reference,
    )
    click.echo(f"serving on http://{server.address[0]}:{server.address[1]}")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


@app.command(
    "export-checkpoint",
    help="Export an orbax checkpoint (step=N/) to a reference-compatible "
    "PyTorch Lightning .ckpt, loadable by the reference/EveryVoice stack.",
)
@click.argument("ckpt_path", type=click.Path(exists=True, path_type=Path))
@click.option(
    "--output", "-o", type=click.Path(path_type=Path), required=True,
    help="Output .ckpt file path.",
)
def export_checkpoint_cmd(ckpt_path: Path, output: Path):
    from ..models.torch_export import export_reference_lightning_checkpoint

    try:
        out = export_reference_lightning_checkpoint(ckpt_path, output)
    except ImportError as exc:
        raise click.UsageError(
            "exporting a .ckpt requires torch in this environment"
        ) from exc
    click.echo(f"exported {ckpt_path} -> {out}")


@app.command(
    "doctor",
    help="Environment diagnostics: versions, native kernels, compile "
    "cache, device reachability (probed with a timeout so a dead TPU "
    "tunnel reports instead of hanging), and optional config/artifact "
    "validation. Exit code 1 on hard failures.",
)
@click.argument(
    "config_file", type=click.Path(exists=True, path_type=Path),
    required=False,
)
@click.option(
    "--device-timeout", type=float, default=60.0, show_default=True,
    help="Seconds to wait for accelerator init before declaring it down.",
)
def doctor_cmd(config_file, device_timeout):
    from .doctor import run_doctor

    raise SystemExit(
        run_doctor(config_file, device_timeout_s=device_timeout,
                   echo=click.echo)
    )


@app.command(
    "export-serving",
    help="Lower the serving program set to StableHLO (jax.export) and write "
    "one self-contained .fs2x artifact: a host with only JAX and this "
    "package's loader serves synthesis with no model code, checkpoint, or "
    "jit compile (synthesis/exported.py).",
)
@click.argument("ckpt_path", type=click.Path(exists=True, path_type=Path))
@click.option(
    "--output", "-o", type=click.Path(path_type=Path), required=True,
    help="Output .fs2x artifact path.",
)
@click.option(
    "--vocoder-path", "-v", type=click.Path(exists=True, path_type=Path),
    default=None, help="Also export the HiFiGAN mel->wav programs.",
)
@click.option(
    "--batch-size", "-b", "batch_sizes", type=int, multiple=True,
    default=(1, 8), show_default=True,
    help="Batch sizes to export programs for (repeatable).",
)
@click.option(
    "--text-bucket", "text_buckets", type=int, multiple=True, default=None,
    help="Text-length buckets (repeatable). Default: every 16-multiple up "
    "to the corpus chunker's max emit length (the warmup shape set).",
)
@click.option("--max-frames", type=int, default=None)
@click.option(
    "--streaming-window", "streaming_windows", type=int, multiple=True,
    default=(128,), show_default=True,
    help="Low-latency windowed-vocoder window sizes (frames) to export "
    "(repeatable); enables low_latency/synthesize_stream from the artifact.",
)
@click.option(
    "--platforms", default=None,
    help="Comma-separated lowering platforms, e.g. 'cpu,tpu' for a portable "
    "artifact. Default: the current backend only. Exporting on TPU bakes "
    "the Pallas kernels (fastest, TPU-only); exporting on CPU traces the "
    "portable op set.",
)
@click.option("--use-ema/--no-use-ema", default=False)
def export_serving_cmd(
    ckpt_path: Path,
    output: Path,
    vocoder_path,
    batch_sizes,
    text_buckets,
    max_frames,
    streaming_windows,
    platforms,
    use_ema,
):
    from ..synthesis.exported import export_serving_artifact

    plats = None
    if platforms:
        plats = ["tpu" if p.strip() == "axon" else p.strip()
                 for p in platforms.split(",") if p.strip()]
    out = export_serving_artifact(
        ckpt_path,
        output,
        vocoder_path=vocoder_path,
        batch_sizes=tuple(batch_sizes),
        text_buckets=tuple(text_buckets) if text_buckets else None,
        max_frames=max_frames,
        streaming_windows=tuple(streaming_windows),
        platforms=plats,
        use_ema=use_ema,
    )
    size_mb = out.stat().st_size / 1e6
    click.echo(f"exported serving artifact -> {out} ({size_mb:.1f} MB)")


@app.command(
    "convert-artifacts",
    help="Convert a reference preprocessed tree (.pt artifacts) to .npy in "
    "place, so a corpus preprocessed with the PyTorch reference trains here "
    "without re-preprocessing.",
)
@click.argument("preprocessed_dir", type=click.Path(exists=True, path_type=Path))
@click.option(
    "--overwrite/--no-overwrite", default=False,
    help="Re-convert even when the .npy sibling already exists.",
)
@click.option("--verbose", "-V", is_flag=True, default=False)
def convert_artifacts_cmd(preprocessed_dir: Path, overwrite: bool, verbose: bool):
    from ..preprocessing.convert import convert_artifact_tree

    try:
        converted, skipped = convert_artifact_tree(
            preprocessed_dir,
            overwrite=overwrite,
            log=click.echo if verbose else (lambda s: None),
        )
    except ImportError as exc:
        raise click.UsageError(
            "converting .pt artifacts requires torch in this environment"
        ) from exc
    click.echo(f"converted {converted} artifacts, skipped {skipped}")


def main():
    app(prog_name="fs2t")


if __name__ == "__main__":
    main()
