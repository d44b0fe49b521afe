"""Deterministic synthetic source-code corpus generator.

Produces the ``files`` input table (repo, path, commit, lang, content)
and the ``labeled_pairs`` ground-truth table described in FIXTURES.md.
Everything is seeded (default 42) — no wall clock, no external data.

This is the analog of the reference's golden-variant fixtures
(vector/tests.go:11-119: one indexed venue + 4 probes with expected
match counts [1,1,0,0]): duplicate-group members are ``exact`` copies,
``near`` variants (whitespace / comment / identifier-rename edits —
the analog of "124 rue St. Viateur o." vs "124 St. Viateur"), or
``hard-negative`` same-block non-duplicates (the analog of
"Cafe Olympico" sharing a geohash with "Open Da Night").

Skew fixtures per FIXTURES.md: one mega-repo holding ~30% of rows, and
a Zipf-weighted 8-language distribution.
"""

from __future__ import annotations

import hashlib
import random
from dataclasses import dataclass, field

import pandas as pd

LANGS = ["python", "javascript", "java", "go", "rust", "ruby", "c", "shell"]
# Zipf-ish weights: javascript/python dominate (blocking-key skew fixture).
LANG_WEIGHTS = [30, 40, 12, 8, 4, 3, 2, 1]

_IDENTS = [
    "parse", "config", "handler", "request", "response", "buffer", "index",
    "token", "cache", "worker", "stream", "batch", "record", "cursor",
    "schema", "writer", "reader", "merge", "split", "filter",
]
_DIRS = ["src", "lib", "pkg", "internal", "core", "util", "api", "cmd", "test"]
_EXT = {
    "python": ".py", "javascript": ".js", "java": ".java", "go": ".go",
    "rust": ".rs", "ruby": ".rb", "c": ".c", "shell": ".sh",
}


def _gen_content(rng: random.Random, lang: str, n_funcs: int = 4) -> str:
    """Seeded template code: a few function-ish blocks.

    Identifiers get a per-module numeric suffix so UNRELATED files share
    only structural tokens (realistic: distinct modules rarely reuse
    whole identifier sets). Without this, a 20-word global vocabulary
    puts every file of a language into one content-band mega-bucket —
    useful as a skew fixture but wrong as the base distribution; skew is
    planted explicitly via the mega-repo and Zipf langs instead.
    """
    pool = [f"{i}_{rng.randint(100, 9999)}" for i in rng.sample(_IDENTS, k=8)]
    lines: list[str] = [f"// module for {rng.choice(pool)} ({lang})"]
    for _ in range(n_funcs):
        name = f"{rng.choice(pool)}_{rng.choice(pool)}"
        args = ", ".join(rng.sample(pool, k=rng.randint(1, 3)))
        lines.append(f"def {name}({args}):")
        for _ in range(rng.randint(2, 6)):
            a, b, c = rng.choice(pool), rng.choice(pool), rng.randint(0, 99)
            lines.append(f"    {a} = {b}({c})")
        lines.append(f"    return {rng.choice(pool)}")
    return "\n".join(lines)


def _perturb_near(rng: random.Random, content: str) -> str:
    """Near-duplicate edit: whitespace + comment + one identifier rename.

    Small enough that token-shingle Jaccard stays high — these MUST match.
    """
    old = rng.choice(_IDENTS)
    new = old + "_v2"
    out = content.replace(old, new)
    lines = out.split("\n")
    pos = rng.randrange(len(lines) + 1)
    lines.insert(pos, f"# edited rev {rng.randint(1, 9)}")
    # whitespace jitter on a couple of lines
    for _ in range(2):
        i = rng.randrange(len(lines))
        lines[i] = lines[i] + "  "
    return "\n".join(lines)


def _perturb_path(rng: random.Random, path: str) -> str:
    """Token-level path perturbation: case / separator / version suffix."""
    choice = rng.randrange(3)
    if choice == 0:
        return path.replace("_", "-")
    if choice == 1:
        root, dot, ext = path.rpartition(".")
        return f"{root}_v{rng.randint(2, 5)}{dot}{ext}"
    parts = path.split("/")
    i = rng.randrange(len(parts))
    parts[i] = parts[i].upper() if rng.random() < 0.5 else parts[i].capitalize()
    return "/".join(parts)


def _commit(rng: random.Random) -> str:
    return "".join(rng.choice("0123456789abcdef") for _ in range(12))


@dataclass
class SynthCorpus:
    files: pd.DataFrame
    labeled_pairs: pd.DataFrame
    n_groups: int = 0
    meta: dict = field(default_factory=dict)


def record_id(repo: str, path: str, commit: str) -> str:
    """Namespaced deterministic record id (ancestor: ids.go:23-25's
    "{prefix}:id={id}"; here a sha256 over the natural key)."""
    return hashlib.sha256(f"{repo}\x1f{path}\x1f{commit}".encode()).hexdigest()


def generate(
    n_rows: int = 1000,
    seed: int = 42,
    dup_fraction: float = 0.35,
    mega_repo_fraction: float = 0.30,
) -> SynthCorpus:
    """Generate a corpus of ~n_rows file records with planted dup groups.

    ~dup_fraction of rows belong to duplicate groups (sizes 2-6, spanning
    repos). mega_repo_fraction of rows land in one mega-repo (skew).
    Returns the files table plus labeled pairs (exact / near positives and
    hard negatives).
    """
    rng = random.Random(seed)
    n_repos = max(4, n_rows // 50)
    repos = [f"org{i % 7}/repo{i}" for i in range(n_repos)]
    mega = "org0/mega-repo"

    def pick_repo() -> str:
        return mega if rng.random() < mega_repo_fraction else rng.choice(repos)

    def pick_lang() -> str:
        return rng.choices(LANGS, weights=LANG_WEIGHTS, k=1)[0]

    def gen_path(lang: str, hint: str | None = None) -> str:
        # stems carry a numeric discriminator: unrelated files share
        # directory tokens (src/lib/... repeat, as in real repos) but
        # not whole stems — otherwise a 20-stem vocabulary puts large
        # fractions of the corpus into shared path-MinHash buckets
        depth = rng.randint(1, 4)
        dirs = [rng.choice(_DIRS) for _ in range(depth)]
        stem = hint or (
            f"{rng.choice(_IDENTS)}_{rng.choice(_IDENTS)}_{rng.randint(10, 9999)}"
        )
        return "/".join(dirs) + f"/{stem}{_EXT[lang]}"

    rows: list[dict] = []
    pairs: list[dict] = []

    n_dup_rows = int(n_rows * dup_fraction)
    n_groups = 0
    while sum(1 for r in rows if r["group"] >= 0) < n_dup_rows:
        gid = n_groups
        n_groups += 1
        size = rng.randint(2, 6)
        lang = pick_lang()
        base_content = _gen_content(rng, lang)
        base_path = gen_path(lang)
        members: list[dict] = []
        for j in range(size):
            if j == 0:
                content, path, kind = base_content, base_path, "base"
            elif rng.random() < 0.45:
                content, path, kind = base_content, _perturb_path(rng, base_path), "exact"
            else:
                content = _perturb_near(rng, base_content)
                path = _perturb_path(rng, base_path)
                kind = "near"
            members.append({
                "repo": pick_repo(), "path": path, "commit": _commit(rng),
                "lang": lang, "content": content, "group": gid, "kind": kind,
            })
        # hard negative: same lang + similar path directory, unrelated content
        if rng.random() < 0.6:
            members.append({
                "repo": pick_repo(),
                "path": _perturb_path(rng, base_path),
                "commit": _commit(rng), "lang": lang,
                "content": _gen_content(rng, lang), "group": gid,
                "kind": "hard-negative",
            })
        rows.extend(members)

    while len(rows) < n_rows:
        lang = pick_lang()
        rows.append({
            "repo": pick_repo(), "path": gen_path(lang), "commit": _commit(rng),
            "lang": lang, "content": _gen_content(rng, lang),
            "group": -1, "kind": "singleton",
        })

    for r in rows:
        r["id"] = record_id(r["repo"], r["path"], r["commit"])

    # labeled pairs: within each group, positives among {base,exact,near},
    # negatives between hard-negative and the rest.
    by_group: dict[int, list[dict]] = {}
    for r in rows:
        if r["group"] >= 0:
            by_group.setdefault(r["group"], []).append(r)
    for gid, members in by_group.items():
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                a, b = members[i], members[j]
                id_a, id_b = sorted((a["id"], b["id"]))
                neg = "hard-negative" in (a["kind"], b["kind"])
                pairs.append({
                    "id_a": id_a, "id_b": id_b,
                    "label": not neg,
                    "kind": "hard-negative" if neg else (
                        "exact" if a["kind"] != "near" and b["kind"] != "near"
                        else "near"),
                    "group": gid,
                })

    files = pd.DataFrame(rows)[
        ["id", "repo", "path", "commit", "lang", "content", "group", "kind"]
    ]
    labeled = pd.DataFrame(pairs)
    return SynthCorpus(files=files, labeled_pairs=labeled, n_groups=n_groups,
                       meta={"seed": seed, "n_rows": len(files)})


def to_spark(spark, corpus: SynthCorpus):
    """Materialize (files_df, labeled_pairs_df). ``files`` carries only the
    input_hint columns; group/kind stay in labeled_pairs for evaluation."""
    files = spark.createDataFrame(
        corpus.files[["repo", "path", "commit", "lang", "content"]]
    )
    labeled = spark.createDataFrame(corpus.labeled_pairs)
    return files, labeled
