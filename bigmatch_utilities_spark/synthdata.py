"""Deterministic synthetic source-code repository table (the north-rule input).

Schema per BASELINE.json input_hint:
    (repo: string, path: string, commit: string, lang: string, content: string)
plus generator-side ground truth (record_id, true_cluster) for the F1 gate.

Planted structure (FIXTURES.md F1):
* exact-duplicate clusters — identical content under different
  (repo, path, commit): forks / vendored copies;
* near-duplicate clusters — whitespace, comment, and identifier mutations
  of a base file (found only by fuzzy comparators / loose passes);
* hard negatives — same lang and similar size, different content;
* skew — a handful of boilerplate contents (license files) shared by many
  repos, so hot blocking keys exist.

Generation is id-driven and seed-deterministic: row i's content is a pure
function of (seed, i), so the table can be built distributed via
``spark.range(n).mapInPandas`` with no driver-side materialization — the
same generator scales from the 10^3-row unit tests to the local[8]/local[32]
throughput bench, and would scale to cluster-sized inputs unchanged.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

LANGS = ["python", "java", "c", "js", "go", "rust"]
EXT = {"python": "py", "java": "java", "c": "c", "js": "js", "go": "go", "rust": "rs"}

_WORDS = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu nu xi "
    "omicron pi rho sigma tau upsilon phi chi psi omega".split()
)

#: cluster-shape mix: (kind, weight). Sizes are small (2-4) for most
#: clusters with a long tail handled by the boilerplate skew group.
_KINDS = [("unique", 55), ("exact", 15), ("near", 22), ("hardneg", 8)]
_KIND_CUM = np.cumsum([w for _, w in _KINDS])

BOILERPLATE_EVERY = 211  # every Nth cluster is a hot boilerplate content


def _rng(seed: int, *parts: int) -> np.random.Generator:
    key = hashlib.sha256(
        ("|".join(str(p) for p in (seed, *parts))).encode()
    ).digest()
    return np.random.default_rng(np.frombuffer(key[:16], dtype=np.uint64))


def _ident(rng: np.random.Generator) -> str:
    return "_".join(rng.choice(_WORDS, size=2))


def _base_content(rng: np.random.Generator, lang: str, cluster: int) -> str:
    """A plausible little source file, deterministic per cluster."""
    fn = _ident(rng)
    lines = [f"# module {fn} ({lang})" if lang == "python" else f"// module {fn} ({lang})"]
    n_funcs = int(rng.integers(2, 6))
    for k in range(n_funcs):
        name = _ident(rng)
        args = ", ".join(_ident(rng) for _ in range(int(rng.integers(1, 4))))
        body = " + ".join(_ident(rng) for _ in range(int(rng.integers(2, 6))))
        if lang == "python":
            lines += [f"def {name}({args}):", f"    return {body}", ""]
        else:
            lines += [f"function {name}({args}) {{", f"  return {body};", "}", ""]
    lines.append(f"const SEED_{cluster} = {int(rng.integers(0, 10**9))}")
    return "\n".join(lines)


_LICENSE = (
    "Permission is hereby granted, free of charge, to any person obtaining a "
    "copy of this software and associated documentation files, to deal in the "
    "software without restriction."
)


def _mutate(rng: np.random.Generator, content: str, strength: int) -> str:
    """Near-duplicate mutation: whitespace / comment / identifier edits that
    keep head+shape recognizable (found by fuzzy passes, not exact hash)."""
    out = content
    for _ in range(strength):
        choice = int(rng.integers(0, 3))
        if choice == 0:  # whitespace churn
            out = out.replace("    ", "\t", 1) if "    " in out else out + "\n"
        elif choice == 1:  # comment insertion
            lines = out.split("\n")
            pos = int(rng.integers(1, len(lines)))
            lines.insert(pos, f"# note {_ident(rng)}")
            out = "\n".join(lines)
        else:  # identifier rename (single token)
            words = [w for w in _WORDS if w in out]
            if words:
                w = words[int(rng.integers(0, len(words)))]
                out = out.replace(w, w + "x")
    return out


def _row(seed: int, i: int) -> dict:
    """Pure function (seed, i) → row. i encodes (cluster, member)."""
    cluster = i >> 3  # up to 8 members per cluster id-space slot
    member = i & 7
    rng = _rng(seed, cluster, 0)
    lang = LANGS[int(rng.integers(0, len(LANGS)))]
    # zipf-ish repo popularity: repo id = cluster mod (heavy head)
    z = int(np.floor((rng.zipf(1.6) - 1) % 500))
    kind_draw = int(rng.integers(0, _KIND_CUM[-1]))
    kind = next(k for (k, _), c in zip(_KINDS, _KIND_CUM) if kind_draw < c)
    is_boiler = cluster % BOILERPLATE_EVERY == 0
    base = _LICENSE if is_boiler else _base_content(rng, lang, cluster)

    mrng = _rng(seed, cluster, member + 1)
    repo = f"org{z % 40}/repo{(z * 7 + member) % 500}"
    path = f"src/{_ident(mrng)}.{EXT[lang]}"
    commit = hashlib.sha1(f"{seed}|{cluster}|{member}".encode()).hexdigest()

    if is_boiler:
        content = base  # identical everywhere → hot exact key
        true_cluster = -1  # boilerplate: excluded from F1 labels
    elif kind == "unique" or member == 0:
        content = base
        true_cluster = cluster
    elif kind == "exact":
        content = base
        true_cluster = cluster
    elif kind == "near":
        content = _mutate(mrng, base, strength=int(mrng.integers(1, 4)))
        true_cluster = cluster
    else:  # hardneg: same lang + similar size, different content
        content = _base_content(_rng(seed, cluster, 100 + member), lang, cluster)
        true_cluster = -(cluster * 10 + member)  # distinct negative labels
    return {
        "record_id": i,
        "repo": repo,
        "path": path,
        "commit": commit,
        "lang": lang,
        "content": content,
        "true_cluster": true_cluster,
    }


def _members_for(kind: str, is_boiler: bool) -> int:
    if is_boiler:
        return 8
    return {"unique": 1, "exact": 3, "near": 3, "hardneg": 2}[kind]


def _cluster_rows(seed: int, cluster: int) -> list[int]:
    rng = _rng(seed, cluster, 0)
    rng.integers(0, len(LANGS))  # burn in same order as _row
    (rng.zipf(1.6) - 1)
    kind_draw = int(rng.integers(0, _KIND_CUM[-1]))
    kind = next(k for (k, _), c in zip(_KINDS, _KIND_CUM) if kind_draw < c)
    n = _members_for(kind, cluster % BOILERPLATE_EVERY == 0)
    return [(cluster << 3) | m for m in range(n)]


def repo_files_pdf(seed: int, n_clusters: int) -> pd.DataFrame:
    """Driver-side generation for unit tests (small n)."""
    rows = []
    for c in range(n_clusters):
        for i in _cluster_rows(seed, c):
            rows.append(_row(seed, i))
    return pd.DataFrame(rows)


def repo_files_df(
    spark: SparkSession, seed: int = 42, n_clusters: int = 1000, partitions: int | None = None
) -> DataFrame:
    """Distributed generation: cluster ids fan out via spark.range →
    mapInPandas; no data ever sits on the driver."""
    schema = (
        "record_id long, repo string, path string, commit string, "
        "lang string, content string, true_cluster long"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for c in pdf["id"].to_numpy():
                for i in _cluster_rows(seed, int(c)):
                    out.append(_row(seed, i))
            yield pd.DataFrame(out)

    rng_df = spark.range(n_clusters)
    if partitions:
        rng_df = rng_df.repartition(partitions)
    return rng_df.mapInPandas(gen, schema=schema)


def true_pairs_pdf(pdf: pd.DataFrame) -> set[tuple[int, int]]:
    """Ground-truth positive pairs (true_cluster >= 0, canonical order)."""
    out = set()
    for _, grp in pdf[pdf["true_cluster"] >= 0].groupby("true_cluster"):
        ids = sorted(grp["record_id"])
        for a in range(len(ids)):
            for b in range(a + 1, len(ids)):
                out.add((ids[a], ids[b]))
    return out
