"""Deterministic synthetic transcript corpus with planted duplicate
clusters (FIXTURES.md F1) -- the fixture generator for recall tests and
benchmarks. No external data; everything derives from a seed.

The near-dup edit operations reimplement the *semantics* of the
reference's misspelling generator
(/root/reference/doppelspeller/feature_engineering_prepare.py:90-173):
QWERTY-neighbor substitution (:14-22,60-87), remove/add/replace letter,
add/remove space, swap words, composing 1-2 ops per variant; only texts
longer than 9 chars are edited (feature_engineering.py:213-215). This is a
re-implementation from the published behavior, not a copy: edits are drawn
from a seeded numpy Generator and applied across a random subset of turns.

Planted structure (FIXTURES.md F1):
  * near-dup clusters of 1-5 variants (edit ops above),
  * exact duplicates (byte-identical),
  * long-span containment dups (doc embedded in a longer doc) -- exercises
    the SimHash path,
  * a boilerplate-heavy subset (identical system prompt) -- exercises
    hot-band salting.
Sidecar ground truth: (conv_id, cluster_id) incl. singletons.
"""

from __future__ import annotations

import math
import random
from dataclasses import dataclass
from datetime import datetime, timedelta

import pandas as pd

# QWERTY neighbourhood, same construction rule as the reference (cartesian
# coordinates, euclidean distance <= 1).
_KEY_XY = {
    "q": (0, 0), "w": (1, 0), "e": (2, 0), "r": (3, 0), "t": (4, 0),
    "y": (5, 0), "u": (6, 0), "i": (7, 0), "o": (8, 0), "p": (9, 0),
    "a": (0, 1), "s": (1, 1), "d": (2, 1), "f": (3, 1), "g": (4, 1),
    "h": (5, 1), "j": (6, 1), "k": (7, 1), "l": (8, 1),
    "z": (0, 2), "x": (1, 2), "c": (2, 2), "v": (3, 2), "b": (4, 2),
    "n": (5, 2), "m": (5, 2),
}


def _neighbours() -> dict[str, list[str]]:
    out: dict[str, set[str]] = {}
    keys = list(_KEY_XY)
    for a in keys:
        for b in keys:
            if a == b:
                continue
            ax, ay = _KEY_XY[a]
            bx, by = _KEY_XY[b]
            if math.hypot(ax - bx, ay - by) <= 1:
                out.setdefault(a, set()).add(b)
    return {k: sorted(v) for k, v in out.items()}


NEIGHBOURS = _neighbours()

def _make_vocabulary(n_words: int = 5000, seed: int = 1234) -> list[str]:
    """Procedural pseudo-word vocabulary. A large vocab keeps *unrelated*
    documents gram-dissimilar (small true Jaccard), so LSH selectivity at
    test scale resembles a real corpus instead of word-salad from a tiny
    wordlist where every doc shares most 3-grams."""
    rng = random.Random(seed)
    onsets = ["b", "c", "d", "f", "g", "h", "j", "k", "l", "m", "n", "p", "r",
              "s", "t", "v", "w", "z", "br", "cl", "dr", "fl", "gr", "pl",
              "pr", "sk", "sl", "sp", "st", "tr"]
    vowels = ["a", "e", "i", "o", "u", "ai", "ea", "io", "ou"]
    codas = ["", "n", "r", "s", "t", "l", "m", "nd", "st", "rk"]
    out: set[str] = set()
    while len(out) < n_words:
        w = "".join(
            rng.choice(onsets) + rng.choice(vowels) + rng.choice(codas)
            for _ in range(rng.randint(1, 3))
        )
        out.add(w)
    return sorted(out)


_WORDS = _make_vocabulary()

_ROLES = ["user", "assistant", "system", "tool"]
_TOOLS = ["search", "calculator", "browser", "python", None, None]

BOILERPLATE = (
    "you are a helpful assistant follow the rules carefully and answer "
    "questions about the data platform with clear steps"
)


# ---- edit ops (reference semantics, seeded RNG) ---------------------------

def _remove_letter(rng: random.Random, x: str) -> str:
    idxs = [i for i, ch in enumerate(x) if ch != " "]
    if not idxs:
        return x
    i = rng.choice(idxs)
    return x[:i] + x[i + 1 :]


def _add_letter(rng: random.Random, x: str) -> str:
    idxs = [i for i, ch in enumerate(x) if ch in NEIGHBOURS]
    if not idxs:
        return x
    i = rng.choice(idxs)
    return x[:i] + rng.choice(NEIGHBOURS[x[i]]) + x[i:]


def _replace_letter(rng: random.Random, x: str) -> str:
    idxs = [i for i, ch in enumerate(x) if ch in NEIGHBOURS]
    if not idxs:
        return x
    i = rng.choice(idxs)
    return x[:i] + rng.choice(NEIGHBOURS[x[i]]) + x[i + 1 :]


def _add_space(rng: random.Random, x: str) -> str:
    idxs = [
        i
        for i in range(1, len(x) - 1)
        if x[i] != " " and x[i - 1] != " " and x[i + 1] != " "
    ]
    if not idxs:
        return x
    i = rng.choice(idxs)
    return x[:i] + " " + x[i:]


def _remove_space(rng: random.Random, x: str) -> str:
    idxs = [i for i, ch in enumerate(x) if ch == " "]
    if not idxs:
        return x
    i = rng.choice(idxs)
    return x[:i] + x[i + 1 :]


def _swap_words(rng: random.Random, x: str) -> str:
    words = x.split()
    if len(words) < 2:
        return x
    i, j = rng.sample(range(len(words)), 2)
    words[i], words[j] = words[j], words[i]
    return " ".join(words)


_EDIT_OPS = [_remove_letter, _add_letter, _replace_letter, _add_space, _remove_space, _swap_words]


def misspell(rng: random.Random, text: str, n_ops: int | None = None) -> str:
    """Compose 1-2 random edit ops (reference: generate_misspelled_name,
    feature_engineering_prepare.py:165-173); texts <= 9 chars pass through
    (feature_engineering.py:213-215)."""
    if len(text) <= 9:
        return text
    ops = rng.sample(_EDIT_OPS, n_ops or rng.randint(1, 2))
    for op in ops:
        text = op(rng, text)
    return text


# ---- corpus ----------------------------------------------------------------

@dataclass
class SyntheticCorpus:
    transcripts: pd.DataFrame   # conv_id, turn_idx, role, text, tool, ts
    truth_clusters: pd.DataFrame  # conv_id, cluster_id


def _random_text(rng: random.Random, n_words: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n_words))


def make_corpus(
    n_conversations: int = 1000,
    dup_fraction: float = 0.3,
    seed: int = 42,
    min_turns: int = 2,
    max_turns: int = 12,
    boilerplate_fraction: float = 0.25,
    containment_fraction: float = 0.05,
    exact_fraction: float = 0.25,
) -> SyntheticCorpus:
    """Build base conversations; a dup_fraction subset gets 1-4 planted
    variants (near-dup via edit ops / exact copy / containment)."""
    rng = random.Random(seed)
    rows: list[tuple] = []
    truth: list[tuple[str, str]] = []
    base_ts = datetime(2026, 1, 1)

    def emit(conv_id: str, turns: list[tuple[str, str, str | None]]):
        for i, (role, text, tool) in enumerate(turns):
            rows.append(
                (conv_id, i, role, text, tool, base_ts + timedelta(seconds=i))
            )

    def make_turns(with_boiler: bool) -> list[tuple[str, str, str | None]]:
        n = rng.randint(min_turns, max_turns)
        turns: list[tuple[str, str, str | None]] = []
        if with_boiler:
            turns.append(("system", BOILERPLATE, None))
        for t in range(n):
            role = _ROLES[t % 2]  # user/assistant alternating
            tool = rng.choice(_TOOLS) if role == "assistant" else None
            turns.append((role, _random_text(rng, rng.randint(4, 40)), tool))
        return turns

    n_dup_bases = int(n_conversations * dup_fraction)
    cluster_seq = 0
    for b in range(n_conversations):
        conv_id = f"c{b:07d}"
        with_boiler = rng.random() < boilerplate_fraction
        turns = make_turns(with_boiler)
        emit(conv_id, turns)
        cluster_id = f"k{cluster_seq:07d}"
        cluster_seq += 1
        truth.append((conv_id, cluster_id))

        if b >= n_dup_bases:
            continue
        # plant 1-4 variants
        n_var = rng.randint(1, 4)
        for v in range(n_var):
            var_id = f"{conv_id}v{v}"
            roll = rng.random()
            if roll < exact_fraction:
                var_turns = list(turns)  # byte-identical
            elif roll < exact_fraction + containment_fraction:
                # containment: same turns + extra prefix/suffix turns
                extra = [
                    ("user", _random_text(rng, rng.randint(4, 10)), None)
                ]
                var_turns = (extra + list(turns)) if rng.random() < 0.5 else (
                    list(turns) + extra
                )
            else:
                # near-dup: edit a random subset of turns
                var_turns = []
                for role, text, tool in turns:
                    if rng.random() < 0.5:
                        text = misspell(rng, text)
                    var_turns.append((role, text, tool))
            emit(var_id, var_turns)
            truth.append((var_id, cluster_id))

    transcripts = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    truth_df = pd.DataFrame(truth, columns=["conv_id", "cluster_id"])
    return SyntheticCorpus(transcripts=transcripts, truth_clusters=truth_df)


def make_title_fixture(
    n_truth: int = 2000,
    n_queries: int = 1000,
    not_found_fraction: float = 0.35,
    seed: int = 7,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """FIXTURES.md F2: a titles_truth / titles_query pair mirroring the
    reference's example-dataset *shape* (misspelled query title -> truth
    title or -1), generated with the same edit-op semantics."""
    rng = random.Random(seed)
    titles = []
    seen = set()
    # >= 4 words (~25+ chars): a single edit op keeps Levenshtein ratio
    # above the 94 threshold, so the deterministic verification stack (which
    # replaces the reference's model tier per north_rule) can close them.
    while len(titles) < n_truth:
        t = _random_text(rng, rng.randint(4, 7))
        if t not in seen and len(t) >= 25:
            seen.add(t)
            titles.append(t)
    truth = pd.DataFrame(
        {"title_id": range(1, n_truth + 1), "title": titles}
    )
    q_rows = []
    for qi in range(n_queries):
        if rng.random() < not_found_fraction:
            # a title unrelated to any truth row
            t = _random_text(rng, rng.randint(7, 12)) + f" zz{qi}qq"
            q_rows.append((qi, t, -1))
        else:
            tid = rng.randint(1, n_truth)
            base = titles[tid - 1]
            q_rows.append((qi, misspell(rng, base, n_ops=1), tid))
    queries = pd.DataFrame(
        q_rows, columns=["query_id", "title", "expected_title_id"]
    )
    return truth, queries
