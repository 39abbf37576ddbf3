"""Generate docs/CONFIG.md from the pydantic config schema.

Every field of FastSpeech2Config (recursively), with type, default, and
description — the single-source-of-truth reference for `-c` dotted-path
overrides and YAML keys. Run `python tools/gen_config_docs.py` after schema
changes; tests/test_docs.py asserts the committed file is current.
"""

from __future__ import annotations

import sys
from enum import Enum
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _type_name(annotation) -> str:
    import typing

    if annotation is None:
        return "None"
    origin = typing.get_origin(annotation)
    if origin is not None:
        args = typing.get_args(annotation)
        names = [a for a in (_type_name(x) for x in args) if a != "NoneType"]
        if origin is typing.Union or str(origin) == "types.UnionType":
            return " | ".join(dict.fromkeys(names))
        base = getattr(origin, "__name__", str(origin))
        return f"{base}[{', '.join(names)}]"
    if isinstance(annotation, type):
        if issubclass(annotation, Enum):
            vals = " \\| ".join(repr(e.value) for e in annotation)
            return f"enum({vals})"
        return annotation.__name__
    return str(annotation).replace("typing.", "")


def _default_repr(field) -> str:
    from pydantic import BaseModel
    from pydantic_core import PydanticUndefined

    def fmt(v):
        if isinstance(v, BaseModel):
            return "(section)"  # sub-model: its fields are listed below
        if isinstance(v, Enum):
            v = v.value
        r = f"`{v!r}`"
        return r if len(r) <= 60 else "(section)"

    if field.default is not PydanticUndefined and field.default is not None:
        return fmt(field.default)
    if field.default_factory is not None:
        try:
            return fmt(field.default_factory())
        except Exception:
            return "factory"
    if field.default is None:
        return "`None`"
    return "required"


def _walk(model_cls, prefix: str, rows: list, seen: set) -> None:
    from pydantic import BaseModel

    for name, field in model_cls.model_fields.items():
        path = f"{prefix}{name}"
        ann = field.annotation
        # unwrap Optional[Model]
        import typing

        inner = None
        if isinstance(ann, type) and issubclass(ann, BaseModel):
            inner = ann
        else:
            for a in typing.get_args(ann):
                if isinstance(a, type) and issubclass(a, BaseModel):
                    inner = a
        desc = (field.description or "").replace("\n", " ").strip()
        rows.append(
            (path, _type_name(ann), _default_repr(field), desc)
        )
        if inner is not None and inner not in seen:
            _walk(inner, f"{path}.", rows, seen | {inner})


def generate() -> str:
    from fastspeech2_lightning_tpu.config import FastSpeech2Config

    rows: list = []
    _walk(FastSpeech2Config, "", rows, set())
    lines = [
        "# Configuration reference",
        "",
        "Generated from the pydantic schema by `tools/gen_config_docs.py` —",
        "do not edit by hand. Every key is a YAML path and a `-c` override",
        "target (`fs2t train config.yaml -c training.batch_size=32`).",
        "Partial files compose exactly like the reference's:",
        "`path_to_{model,training,preprocessing,text}_config_file`.",
        "",
        "| Key | Type | Default | Description |",
        "|---|---|---|---|",
    ]
    for path, tname, default, desc in rows:
        tname = tname.replace("|", "\\|")
        lines.append(f"| `{path}` | {tname} | {default} | {desc} |")
    lines.append("")
    return "\n".join(lines)


if __name__ == "__main__":
    out = Path(__file__).resolve().parents[1] / "docs" / "CONFIG.md"
    out.write_text(generate())
    print(f"wrote {out}")
