"""Configuration system.

Self-contained pydantic-v2 schemas with the same shape and semantics as the
reference's config layer (fs2/config/__init__.py plus the upstream everyvoice
shared configs it composes — see SURVEY.md §2.2):

 - partial-file composition: a main YAML/JSON may point at
   ``path_to_{model,training,preprocessing,text}_config_file`` partials which
   are loaded relative to the main file (fs2/config/__init__.py:280-289)
 - dotted-path CLI overrides ``-c key.sub=value`` (everyvoice
   load_config_base_command semantics, demonstrated at
   fs2/tests/test_cli.py:114-128)
 - schema versioning with check-and-upgrade (fs2/config/__init__.py:299-317)
"""

from __future__ import annotations

import json
from enum import Enum
from pathlib import Path
from typing import Annotated, Any, List, Literal, Optional, Tuple, Union

import yaml
from pydantic import (
    BaseModel,
    ConfigDict,
    Field,
    ValidationInfo,
    field_serializer,
    field_validator,
    model_validator,
)

# Latest config schema version (reference: fs2/config/__init__.py:28).
LATEST_VERSION: str = "1.1"


class ConfigModel(BaseModel):
    """Base for all config sub-models: validate on assignment, forbid surprises."""

    model_config = ConfigDict(extra="ignore", validate_assignment=True)


# ---------------------------------------------------------------------------
# Enums
# ---------------------------------------------------------------------------


class TargetTrainingTextRepresentationLevel(str, Enum):
    """Parity with everyvoice.config.type_definitions."""

    characters = "characters"
    ipa_phones = "phones"
    phonological_features = "phonological_features"


class DatasetTextRepresentation(str, Enum):
    characters = "characters"
    ipa_phones = "phones"
    arpabet = "arpabet"


class VarianceLevelEnum(str, Enum):
    phone = "phone"
    frame = "frame"


class VarianceLossEnum(str, Enum):
    mse = "mse"
    mae = "mae"


class EarlyStoppingMetricEnum(str, Enum):
    none = "none"
    mae = "mae"
    js = "js"


# ---------------------------------------------------------------------------
# Audio / preprocessing config (everyvoice PreprocessingConfig surface used by
# the reference; field names pinned by fs2/tests/data/config/everyvoice-shared-data.yaml)
# ---------------------------------------------------------------------------


class AudioConfig(ConfigModel):
    min_audio_length: float = Field(
        default=0.4, description="Minimum audio length in seconds to keep."
    )
    max_audio_length: float = Field(
        default=11.0, description="Maximum audio length in seconds to keep."
    )
    max_wav_value: float = Field(default=32767.0)
    input_sampling_rate: int = Field(default=22050)
    output_sampling_rate: int = Field(default=22050)
    alignment_sampling_rate: int = Field(default=22050)
    target_bit_depth: int = Field(default=16)
    n_fft: int = Field(default=1024)
    fft_window_size: int = Field(default=1024)
    fft_hop_size: int = Field(default=256)
    f_min: int = Field(default=0)
    f_max: int = Field(default=8000)
    n_mels: int = Field(default=80)
    spec_type: str = Field(
        default="mel-librosa",
        description="Spectrogram type: 'mel-librosa' (slaney mel filters), "
        "'mel' (HTK filters), 'linear', or 'raw'.",
    )
    vocoder_segment_size: int = Field(default=8192)


class DatasetSource(ConfigModel):
    label: str = Field(default="dataset_0")
    data_dir: Path = Field(default=Path("."))
    filelist: Path = Field(default=Path("filelist.psv"))
    filelist_loader: str = Field(default="psv")
    permissions_obtained: bool = Field(default=False)
    sox_effects: list = Field(default_factory=list)


class PreprocessingConfig(ConfigModel):
    dataset: str = Field(default="YourDataSet")
    dataset_split_seed: int = Field(default=1234)
    train_split: float = Field(default=0.9)
    save_dir: Path = Field(default=Path("./preprocessed"))
    cpus: Optional[int] = Field(default=None, description="Worker processes.")
    audio: AudioConfig = Field(default_factory=AudioConfig)
    source_data: List[DatasetSource] = Field(default_factory=list)

    @field_validator("save_dir", mode="before")
    @classmethod
    def _relative_save_dir(cls, value: Any, info: ValidationInfo) -> Any:
        return _path_relative_to_config(value, info)


# ---------------------------------------------------------------------------
# Text config (everyvoice TextConfig surface)
# ---------------------------------------------------------------------------


class BoundaryConfig(ConfigModel):
    """Per-language strong/weak chunking boundary characters
    (everyvoice TextConfig.boundaries surface, fs2/cli/synthesize.py:95-100)."""

    strong: str = ".!?:;"
    weak: str = ",-— "


class TextConfig(ConfigModel):
    split_text: bool = Field(
        default=True,
        description="Whether to chunk long inputs at synthesis time.",
    )
    boundaries: dict = Field(
        default_factory=dict,
        description="language -> {strong, weak} boundary characters.",
    )
    symbols: dict = Field(
        default_factory=dict,
        description="Mapping of named symbol sets (lists of strings); the union "
        "defines the model's symbol inventory. Key 'pad' is the display pad; "
        "'silence' lists silence tokens.",
    )
    to_replace: dict = Field(default_factory=dict)
    cleaners: List[str] = Field(
        default_factory=lambda: ["lower", "collapse_whitespace", "nfc_normalize"],
        description="Named text cleaners applied in order.",
    )
    g2p_engines: dict = Field(
        default_factory=dict,
        description="Optional mapping language -> dotted path of a g2p callable.",
    )

    @field_validator("cleaners", mode="before")
    @classmethod
    def _strip_module_paths(cls, v: Any) -> Any:
        # accept everyvoice-style dotted callables e.g. "everyvoice.utils.lower"
        if isinstance(v, list):
            return [c.rsplit(".", 1)[-1] if isinstance(c, str) else c for c in v]
        return v


# ---------------------------------------------------------------------------
# Model config (parity with fs2/config/__init__.py:31-175)
# ---------------------------------------------------------------------------


class ConformerConfig(ConfigModel):
    layers: int = Field(default=4, description="Number of Conformer layers.")
    heads: int = Field(default=2, description="Attention heads.")
    input_dim: int = Field(default=256, description="Hidden width.")
    feedforward_dim: int = Field(default=1024, description="FFN width.")
    conv_kernel_size: int = Field(default=9, description="Depthwise conv kernel.")
    dropout: float = Field(default=0.2, description="Dropout rate.")
    attention_dropout: Optional[float] = Field(
        default=None,
        description=(
            "Dropout on the attention probabilities. None (default) follows "
            "`dropout` — the reference's torchaudio-Conformer behavior "
            "(fs2/model.py:95-119). Setting 0.0 keeps every other dropout "
            "but lets TRAINING use the flash-attention kernel, which avoids "
            "materializing the [B, heads, T, T] score tensor (measured ~3x "
            "faster train step at B=32/T=1024 on TPU v5e)."
        ),
    )


class VariancePredictorBase(ConfigModel):
    loss: VarianceLossEnum = Field(default=VarianceLossEnum.mse)
    n_layers: int = Field(default=5)
    kernel_size: int = Field(default=3)
    dropout: float = Field(default=0.5)
    input_dim: int = Field(default=256)
    n_bins: int = Field(default=256)
    depthwise: bool = Field(default=True)

    @field_serializer("loss")
    def convert_loss_enum(self, loss: VarianceLossEnum):
        return loss.value


class VariancePredictorConfig(VariancePredictorBase):
    level: VarianceLevelEnum = Field(default=VarianceLevelEnum.phone)

    @field_serializer("level")
    def convert_level_enum(self, level: VarianceLevelEnum):
        return level.value


class VariancePredictors(ConfigModel):
    energy: VariancePredictorConfig = Field(default_factory=VariancePredictorConfig)
    duration: VariancePredictorBase = Field(default_factory=VariancePredictorBase)
    pitch: VariancePredictorConfig = Field(default_factory=VariancePredictorConfig)


class FastSpeech2ModelConfig(ConfigModel):
    encoder: ConformerConfig = Field(default_factory=ConformerConfig)
    decoder: ConformerConfig = Field(default_factory=ConformerConfig)
    variance_predictors: VariancePredictors = Field(default_factory=VariancePredictors)
    target_text_representation_level: TargetTrainingTextRepresentationLevel = (
        TargetTrainingTextRepresentationLevel.characters
    )
    learn_alignment: bool = Field(
        default=True,
        description="Jointly learn alignments with conv attention + monotonic "
        "alignment search (Badlani et al. 2021). If False, precomputed "
        "durations must exist under preprocessed/duration.",
    )
    use_global_style_token_module: bool = Field(default=False)
    max_length: int = Field(
        default=1000, description="Maximum number of input text symbols."
    )
    mel_loss: VarianceLossEnum = Field(default=VarianceLossEnum.mse)
    use_postnet: bool = Field(default=True)
    multilingual: bool = Field(default=False)
    multispeaker: bool = Field(default=False)
    # --- TPU-specific knobs (no reference equivalent) ---
    max_mel_length: int = Field(
        default=2048,
        description="Static cap on mel frames for jit-compiled shapes; batches "
        "are padded/bucketed up to this.",
    )
    dtype: str = Field(
        default="bfloat16",
        description="Computation dtype on TPU ('bfloat16' or 'float32'). "
        "Parameters are always float32.",
    )

    @field_serializer("mel_loss")
    def convert_mel_loss_enum(self, mel_loss: VarianceLossEnum):
        return mel_loss.value

    @field_serializer("target_text_representation_level")
    def convert_training_enum(self, level: TargetTrainingTextRepresentationLevel):
        return level.value


class EarlyStoppingConfig(ConfigModel):
    metric: EarlyStoppingMetricEnum = EarlyStoppingMetricEnum.none
    patience: int = 4

    @field_serializer("metric")
    def convert_metric_enum(self, metric: EarlyStoppingMetricEnum):
        return metric.value


# ---------------------------------------------------------------------------
# Training config (fs2/config/__init__.py:193-243 + everyvoice BaseTrainingConfig)
# ---------------------------------------------------------------------------


class NoamOptimizer(ConfigModel):
    name: str = Field(default="noam")
    learning_rate: float = Field(default=1e-3)
    betas: Tuple[float, float] = Field(default=(0.9, 0.999))
    eps: float = Field(default=1e-8)
    weight_decay: float = Field(default=1e-6)
    warmup_steps: int = Field(default=1000)


class LoggerConfig(ConfigModel):
    name: str = Field(default="BaseExperiment")
    save_dir: Path = Field(default=Path("./logs_and_checkpoints"))
    sub_dir_callable: str = Field(default="time")
    version: str = Field(default="base")

    @field_validator("save_dir", mode="before")
    @classmethod
    def _relative_save_dir(cls, value: Any, info: ValidationInfo) -> Any:
        return _path_relative_to_config(value, info)


class FastSpeech2TrainingConfig(ConfigModel):
    batch_size: int = Field(default=16)
    save_top_k_ckpts: int = Field(default=5)
    ckpt_steps: Optional[int] = Field(default=None)
    ckpt_epochs: Optional[int] = Field(default=1)
    val_check_interval: Optional[Union[int, float]] = Field(default=500)
    prefetch_batches: int = Field(
        default=2,
        description="Host->device input batches kept in flight by the "
        "training loop's background prefetcher (0 disables; the analogue of "
        "DataLoader workers).",
    )
    fused_optimizer: bool = Field(
        default=False,
        description="Run clip+AdamW on one raveled parameter buffer "
        "(training/fused_optim.py) instead of optax's per-leaf chain — "
        "numerically identical, and the flat Adam moments shard over the "
        "data axis (ZeRO-1) on a mesh. Default off: measured on v5e at "
        "B=32/T=1024 the whole per-leaf optimizer costs only ~0.6 ms of a "
        "~41 ms step, and the ravel/unravel copies make the fused path "
        "~0.5 ms slower. Worth enabling only when optimizer-state HBM is "
        "the binding constraint. Ignored (per-leaf forced) under tensor "
        "parallelism, where moments must shard with their params.",
    )
    steps_per_call: int = Field(
        default=1,
        ge=1,
        description="Fuse this many optimizer steps into one device "
        "dispatch (a lax.scan over the train-step core, "
        "training/step.py make_multi_train_step). Amortizes the "
        "host->device round trip a remote/tunneled TPU pays per call "
        "(~2.3 ms/step measured at B=32/T=1024, serialized by the "
        "transport). Math is bit-identical to sequential steps; per-step "
        "losses are still logged exactly. Validation / checkpoint / "
        "early-stop cadences quantize UP to the next call boundary (at "
        "most k-1 steps late); preemption checkpoints land on a call "
        "boundary. Only consecutive same-shape batches fuse (length "
        "buckets flush early), so the win is largest on uniform-shape "
        "corpora. Default 1: exact cadence fidelity — and on this repo's "
        "tunneled v5e, k=4 measured NEUTRAL-to-negative (36.7 vs 35.9 "
        "ms/step at B=32/T=1024: dispatch already pipelines; the residual "
        "wall-vs-device gap is on-device scheduling bubbles). Worth "
        "enabling only on links where per-dispatch latency demonstrably "
        "binds.",
    )
    prng_impl: Literal["unsafe_rbg", "rbg", "threefry2x32"] = Field(
        default="unsafe_rbg",
        description="JAX PRNG implementation for training randomness "
        "(dropout masks). 'unsafe_rbg' uses the TPU hardware RNG — measured "
        "42.6 vs 72.4 ms/step at B=32/T=1024 (threefry mask generation was "
        "~40% of the step). 'threefry2x32' restores the default "
        "counter-based stream (bit-reproducible across shardings/versions). "
        "Like torch DDP's per-rank dropout, rbg streams are statistically "
        "but not bitwise sharding-invariant. A typo here used to fall back "
        "to threefry silently (~70% slower step) — now a config error.",
    )
    async_checkpoint: bool = Field(
        default=False,
        description="Overlap checkpoint I/O with training: the state is "
        "snapshotted on-device (a cheap HBM copy, safe against the next "
        "step's buffer donation) and a background thread does the "
        "device->host fetch + orbax write + top-k prune while steps keep "
        "running. At most one save is in flight; the next save (and trainer "
        "exit) joins the previous one and re-raises its failure. Worth "
        "enabling when state is large or the device link is slow; default "
        "off for strictly serial failure semantics.",
    )
    halt_on_non_finite: bool = Field(
        default=True,
        description="Raise TrainingDivergedError when a fetched training "
        "loss is NaN/inf instead of silently optimizing on garbage for the "
        "rest of the run (losses are fetched on the logging cadence, so the "
        "guard costs nothing extra). Resume from the last good checkpoint "
        "after lowering the LR / inspecting the data.",
    )
    max_epochs: int = Field(default=1000)
    max_steps: int = Field(default=100000)
    finetune_checkpoint: Optional[Path] = Field(default=None)
    training_filelist: Path = Field(default=Path("./preprocessed/training_filelist.psv"))
    validation_filelist: Path = Field(
        default=Path("./preprocessed/validation_filelist.psv")
    )
    filelist_loader: str = Field(default="psv")
    logger: LoggerConfig = Field(default_factory=LoggerConfig)
    train_data_workers: int = Field(default=4)
    val_data_workers: int = Field(default=0)
    use_weighted_sampler: bool = Field(default=False)
    optimizer: NoamOptimizer = Field(
        default_factory=lambda: NoamOptimizer(
            betas=(0.9, 0.999), learning_rate=1e-3, warmup_steps=1000, weight_decay=1e-6
        )
    )
    # The reference defines EarlyStoppingConfig but never wires it up
    # (fs2/config/__init__.py:204-205 TODO); here it is implemented: training
    # stops when the monitored validation loss hasn't improved for `patience`
    # validation rounds (metric 'none' disables it).
    early_stopping: EarlyStoppingConfig = Field(default_factory=EarlyStoppingConfig)
    vocoder_path: Optional[Path] = None
    mel_loss_weight: float = Field(default=1.0)
    postnet_loss_weight: float = Field(default=1.0)
    pitch_loss_weight: float = Field(default=0.1)
    energy_loss_weight: float = Field(default=0.1)
    duration_loss_weight: float = Field(default=0.1)
    attn_ctc_loss_weight: float = Field(default=0.1)
    attn_bin_loss_weight: float = Field(default=0.1)
    attn_bin_loss_warmup_epochs: Annotated[int, Field(ge=1)] = Field(default=100)
    gradient_clip_val: float = Field(default=1.0)
    ema_decay: float = Field(
        default=0.0,
        ge=0.0,
        lt=1.0,
        description="Exponential-moving-average decay for a shadow copy of "
        "the weights (0 disables). The EMA tree is updated inside the jitted "
        "train step, saved as 'ema_params' in every checkpoint, and used at "
        "synthesis with --use-ema. No reference equivalent.",
    )
    freeze_components: list[str] = Field(
        default_factory=list,
        description="Top-level parameter subtrees to freeze during "
        "(fine-)tuning, e.g. ['encoder', 'text_input_layer']. The reference's "
        "loss signature accepts frozen_components but never uses it "
        "(fs2/loss.py:19-32); here freezing is enforced in the optimizer "
        "(masked zero updates), which also zeroes their weight decay.",
    )
    seed: int = Field(default=0)
    bucket_count: int = Field(
        default=4,
        description="Number of static (text, mel) length buckets; each bucket "
        "is one compiled program (TPU-specific; no reference equivalent).",
    )

    @field_validator(
        "training_filelist", "validation_filelist", "vocoder_path", mode="before"
    )
    @classmethod
    def _relative_paths(cls, value: Any, info: ValidationInfo) -> Any:
        return _path_relative_to_config(value, info)


class ContactInformation(ConfigModel):
    contact_name: str = Field(default="")
    contact_email: str = Field(default="")


# ---------------------------------------------------------------------------
# Partial-file composition + relative-path resolution machinery
# ---------------------------------------------------------------------------

_CONTEXT_STACK: list[dict] = []


class init_context:
    """Context manager supplying validation context (e.g. config_path) to
    pydantic validators — parity with everyvoice.config.shared_types.init_context."""

    def __init__(self, context: dict):
        self.context = context

    def __enter__(self):
        _CONTEXT_STACK.append(self.context)
        return self.context

    def __exit__(self, *exc):
        _CONTEXT_STACK.pop()
        return False


def _current_context() -> Optional[dict]:
    return _CONTEXT_STACK[-1] if _CONTEXT_STACK else None


def _path_relative_to_config(value: Any, info: ValidationInfo) -> Any:
    """Resolve a possibly-relative path against the config file's directory."""
    if value is None or not isinstance(value, (str, Path)):
        return value
    path = Path(value)
    if path.is_absolute():
        return path
    context = info.context if info.context is not None else _current_context()
    if context and context.get("config_path"):
        base = Path(context["config_path"]).parent
        return (base / path).resolve()
    return path


def load_config_from_json_or_yaml_path(path: Path) -> dict:
    path = Path(path)
    if not path.exists():
        raise FileNotFoundError(f"Config file not found: {path}")
    with open(path, "r", encoding="utf8") as f:
        if path.suffix in (".json",):
            return json.load(f)
        return yaml.safe_load(f) or {}


def load_partials(
    data: dict, partial_keys: tuple, config_path: Optional[Path] = None
) -> dict:
    """Merge partial config files referenced by path_to_<key>_config_file.

    Inline values take precedence over the partial file's values (matching
    everyvoice.config.utils.load_partials: the partial is the base, the main
    file's inline section overrides it).
    """
    if not isinstance(data, dict):
        return data
    for key in partial_keys:
        path_key = f"path_to_{key}_config_file"
        rel = data.get(path_key)
        if not rel:
            continue
        partial_path = Path(rel)
        if not partial_path.is_absolute() and config_path is not None:
            partial_path = (Path(config_path).parent / partial_path).resolve()
        partial = load_config_from_json_or_yaml_path(partial_path)
        inline = data.get(key)
        if isinstance(inline, dict):
            merged = dict(partial)
            merged.update(inline)
            data[key] = merged
        else:
            data[key] = partial
        data[path_key] = str(partial_path)
    return data


# ---------------------------------------------------------------------------
# Top-level config (parity with fs2/config/__init__.py:246-317)
# ---------------------------------------------------------------------------


class FastSpeech2Config(ConfigModel):
    VERSION: str = LATEST_VERSION
    contact: ContactInformation = Field(default_factory=ContactInformation)

    model: FastSpeech2ModelConfig = Field(default_factory=FastSpeech2ModelConfig)
    path_to_model_config_file: Optional[Path] = None

    training: FastSpeech2TrainingConfig = Field(
        default_factory=FastSpeech2TrainingConfig
    )
    path_to_training_config_file: Optional[Path] = None

    preprocessing: PreprocessingConfig = Field(default_factory=PreprocessingConfig)
    path_to_preprocessing_config_file: Optional[Path] = None

    text: TextConfig = Field(default_factory=TextConfig)
    path_to_text_config_file: Optional[Path] = None

    @model_validator(mode="before")
    @classmethod
    def _load_partials(cls, data: Any, info: ValidationInfo) -> Any:
        if not isinstance(data, dict):
            return data
        context = info.context if info.context is not None else _current_context()
        config_path = context.get("config_path") if context else None
        return load_partials(
            data, ("model", "training", "preprocessing", "text"), config_path
        )

    @model_validator(mode="after")
    def _ensure_phone_symbols(self) -> "FastSpeech2Config":
        """Phones-level models need the bundled g2p's IPA inventory in the
        symbol table when the user declared no phone set of their own —
        otherwise every g2p output token would be filtered out. Character
        models are untouched (their symbol tables/ids stay stable)."""
        level = self.model.target_text_representation_level
        if level != TargetTrainingTextRepresentationLevel.characters:
            if "g2p_ipa" not in self.text.symbols:
                from ..text.g2p import IPA_PHONES

                declared = set()
                for key, val in self.text.symbols.items():
                    if key == "pad":
                        continue
                    declared.update([val] if isinstance(val, str) else val)
                missing = [p for p in IPA_PHONES if p not in declared]
                if missing:
                    self.text.symbols["g2p_ipa"] = missing
        return self

    @model_validator(mode="before")
    @classmethod
    def check_and_upgrade_checkpoint(cls, data: Any) -> Any:
        """Version gate + successive upgrade (fs2/config/__init__.py:299-317)."""
        if not isinstance(data, dict) or "VERSION" not in data:
            return data
        from packaging.version import Version

        ckpt_version = Version(str(data.get("VERSION", "0.0")))
        if ckpt_version > Version(LATEST_VERSION):
            raise ValueError(
                "Your config was created with a newer version of this software, "
                "please update."
            )
        if ckpt_version < Version("1.0"):
            data["VERSION"] = "1.0"
        return data

    @staticmethod
    def load_config_from_path(path: Path | str) -> "FastSpeech2Config":
        path = Path(path)
        raw = load_config_from_json_or_yaml_path(path)
        with init_context({"config_path": path}):
            return FastSpeech2Config.model_validate(
                raw, context={"config_path": path}
            )

    def model_checkpoint_dump(self) -> dict:
        """Checkpoint-safe dict dump (paths as strings, enums as values)."""
        return json.loads(self.model_dump_json())


# ---------------------------------------------------------------------------
# Dotted-path CLI overrides (everyvoice load_config_base_command semantics)
# ---------------------------------------------------------------------------


def _parse_override_value(value: str) -> Any:
    try:
        return yaml.safe_load(value)
    except Exception:
        return value


def apply_overrides(config_dict: dict, overrides: list[str]) -> dict:
    """Apply ``key.sub.path=value`` overrides onto a raw config dict."""
    for item in overrides:
        if "=" not in item:
            raise ValueError(f"Override must look like key.path=value, got: {item}")
        dotted, value = item.split("=", 1)
        keys = dotted.strip().split(".")
        node = config_dict
        for k in keys[:-1]:
            if k not in node or not isinstance(node[k], dict):
                node[k] = {}
            node = node[k]
        node[keys[-1]] = _parse_override_value(value)
    return config_dict


def load_config_base_command(
    config_file: Path | str, config_args: Optional[list[str]] = None
) -> FastSpeech2Config:
    """Load config from a path with -c dotted overrides applied before validation."""
    path = Path(config_file)
    raw = load_config_from_json_or_yaml_path(path)
    raw = load_partials(raw, ("model", "training", "preprocessing", "text"), path)
    if config_args:
        raw = apply_overrides(raw, config_args)
    with init_context({"config_path": path}):
        return FastSpeech2Config.model_validate(raw, context={"config_path": path})
