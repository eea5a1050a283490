"""Model catalog: the single source of truth for model assets.

Mirror of the reference's native catalog (reference:
core/moonshine-model-catalog.{h,cpp} + generated file metadata): each
entry lists the files an architecture needs, expected sizes/checksums
where known, and where to resolve them.  This environment has no egress,
so the resolver only checks local directories (``MOONSHINE_TPU_CACHE``,
explicit paths); the download step is a separate, gated hook that a
deployment wires to its artifact store.
"""

from __future__ import annotations

import dataclasses
import json
import os
import zlib
from dataclasses import dataclass, field
from pathlib import Path
from typing import Optional

DEFAULT_CACHE_ENV = "MOONSHINE_TPU_CACHE"  # reference: MOONSHINE_VOICE_CACHE
_REFERENCE_TOKENIZER = (
    "/root/reference/language-bindings/python/src/moonshine_voice/assets/"
    "tiny-en/tokenizer.bin"
)


@dataclass(frozen=True)
class CatalogFile:
    name: str  # canonical filename, e.g. "model.safetensors"
    size: int = 0  # 0 = unknown
    crc32c: str = ""  # empty = unchecked
    optional: bool = False


@dataclass(frozen=True)
class CatalogEntry:
    model: str  # e.g. "tiny", "base", "tiny_streaming"
    language: str = "en"
    files: tuple[CatalogFile, ...] = ()

    @property
    def key(self) -> str:
        return f"{self.model}-{self.language}"


_STANDARD_FILES = (
    CatalogFile("model.safetensors"),
    CatalogFile("tokenizer.bin"),
    CatalogFile("config.json", optional=True),
)
_STREAMING_FILES = _STANDARD_FILES + (
    CatalogFile("streaming_config.json", optional=True),
)

CATALOG: dict[str, CatalogEntry] = {}
for _m in ("tiny", "base"):
    for _lang in ("en", "ar", "zh", "ja", "ko", "uk", "vi", "es"):
        e = CatalogEntry(_m, _lang, _STANDARD_FILES)
        CATALOG[e.key] = e
for _m in ("tiny_streaming", "small_streaming", "medium_streaming"):
    e = CatalogEntry(_m, "en", _STREAMING_FILES)
    CATALOG[e.key] = e

VAD_ENTRY = CatalogEntry("vad", "any", (CatalogFile("vad.safetensors"),))
EMBEDDING_ENTRY = CatalogEntry(
    "embeddinggemma-300m", "any",
    (CatalogFile("model.safetensors"), CatalogFile("tokenizer.bin")),
)
DIARIZATION_ENTRY = CatalogEntry(
    "diarization", "any",
    (CatalogFile("segmentation.safetensors"), CatalogFile("embedding.safetensors")),
)


def list_models() -> list[str]:
    return sorted(CATALOG)


def catalog_json() -> str:
    """JSON listing (reference: the catalog JSON C APIs,
    moonshine-c-api.h:910-1074)."""
    return json.dumps(
        {
            key: {
                "model": e.model,
                "language": e.language,
                "files": [dataclasses.asdict(f) for f in e.files],
            }
            for key, e in CATALOG.items()
        },
        indent=2,
    )


def cache_dir() -> Path:
    root = os.environ.get(DEFAULT_CACHE_ENV)
    if root:
        return Path(root)
    return Path.home() / ".cache" / "moonshine_tpu"


def crc32c_of(path: Path) -> str:
    # zlib crc32 stands in for crc32c in this build; the field carries
    # whichever the manifest generator wrote.
    h = 0
    with open(path, "rb") as f:
        while chunk := f.read(1 << 20):
            h = zlib.crc32(chunk, h)
    return f"{h:08x}"


@dataclass
class ResolvedModel:
    entry: CatalogEntry
    root: Path
    files: dict[str, Path] = field(default_factory=dict)

    def path(self, name: str) -> Optional[Path]:
        return self.files.get(name)


def resolve(
    model: str,
    language: str = "en",
    search_dirs: list[str | Path] | None = None,
    verify: bool = False,
) -> ResolvedModel:
    """Locate a model's files locally.

    Searches explicit dirs, then ``<cache>/<model>-<language>/``.  Missing
    non-optional files raise FileNotFoundError listing what's absent —
    the reference's behavior when assets are missing and downloads are
    disabled.
    """
    key = f"{model}-{language}"
    entry = CATALOG.get(key)
    if entry is None:
        raise KeyError(f"Unknown model {key!r}; known: {list_models()}")
    roots = [Path(d) for d in (search_dirs or [])]
    roots.append(cache_dir() / key)
    missing: list[str] = []
    resolved = None
    for root in roots:
        files: dict[str, Path] = {}
        missing = []
        for f in entry.files:
            p = root / f.name
            if p.exists():
                if verify and f.crc32c and crc32c_of(p) != f.crc32c:
                    raise ValueError(f"Checksum mismatch for {p}")
                files[f.name] = p
            elif not f.optional:
                missing.append(f.name)
        if not missing:
            resolved = ResolvedModel(entry, root, files)
            break
    if resolved is None:
        # Last resort: the reference repo ships the tiny-en tokenizer;
        # loaders can still run with random-initialized weights.
        raise FileNotFoundError(
            f"Model assets for {key} not found (missing {missing}); searched "
            f"{[str(r) for r in roots]}. Place files there or set "
            f"${DEFAULT_CACHE_ENV}."
        )
    return resolved


def default_tokenizer_path() -> Optional[str]:
    """tokenizer.bin fallback: the reference's bundled tiny-en tokenizer
    (shared across the English model family)."""
    if os.path.exists(_REFERENCE_TOKENIZER):
        return _REFERENCE_TOKENIZER
    return None
