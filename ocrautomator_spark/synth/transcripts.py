"""Deterministic synthetic transcripts generator (FIXTURES.md §A).

Counter-based PRNG keyed on (seed, conv_id, turn_idx, stream) — no global RNG
state, so any row is reproducible in isolation and generation parallelizes
across executors (each Spark task generates whole conversations
independently). Conversation-length distribution is deliberately skewed
(90% short / 9% medium / 1% long-tail 200–5000 turns) to exercise the salted
repartition that the north_star mandates (BASELINE.json:6).

Pure Python + pandas only — no pyspark imports (the distributed wrapper lives
in ocrautomator_spark.spark.synth_job).
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta

import pandas as pd

SEED = 42
BASE_TS = datetime(2025, 1, 1, 0, 0, 0)

VOCAB = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima "
    "mike november oscar papa quebec romeo sierra tango uniform victor whiskey "
    "xray yankee zulu amber basin cedar dune ember fjord grove harbor inlet "
    "jetty knoll lagoon mesa nadir oasis prairie quarry ridge summit tundra "
    "upland valley wharf yonder zephyr anchor beacon candle drum easel fable "
    "gable hollow ivory jumble kernel ladder marble"
).split()
assert len(VOCAB) == 64

TOOLS = ("search", "browser", "python", "sql")
NAV_WORDS = ("Home", "About", "Products", "Blog", "Contact", "Careers", "Docs", "Pricing")


def _h64(*parts: object) -> int:
    key = "|".join(str(p) for p in parts).encode()
    return int.from_bytes(hashlib.blake2b(key, digest_size=8).digest(), "big")


def _u(*parts: object) -> float:
    return _h64(*parts) / 2**64


def _ri(lo: int, hi: int, *parts: object) -> int:
    """Uniform int in [lo, hi]."""
    return lo + _h64(*parts) % (hi - lo + 1)


def _word(*parts: object) -> str:
    return VOCAB[_h64(*parts) % 64]


def _sentence(*key: object) -> str:
    n = _ri(5, 12, *key, "slen")
    words = [_word(*key, "w", i) for i in range(n)]
    words[0] = words[0].capitalize()
    return " ".join(words) + "."


def _paragraph(*key: object) -> str:
    n = _ri(2, 5, *key, "plen")
    return " ".join(_sentence(*key, "s", i) for i in range(n))


def _hard_wrap(text: str, width: int, *key: object) -> list[str]:
    """Wrap at ~width chars, hyphenating long words at deterministic breaks."""
    lines: list[str] = []
    cur = ""
    for wi, w in enumerate(text.split()):
        if not cur:
            cur = w
            continue
        if len(cur) + 1 + len(w) <= width:
            cur += " " + w
        elif len(w) >= 6 and width - len(cur) >= 4 and _u(*key, "hyph", wi) < 0.5:
            cut = _ri(2, len(w) - 2, *key, "cut", wi)
            lines.append(cur + " " + w[:cut] + "-")
            cur = w[cut:]
        else:
            lines.append(cur)
            cur = w
    if cur:
        lines.append(cur)
    return lines


# ---- payload builders ----

def _payload_html(key: tuple) -> str:
    nav = "".join(
        f'<li><a href="/{NAV_WORDS[_h64(*key, "nav", i) % 8].lower()}">'
        f'{NAV_WORDS[_h64(*key, "nav", i) % 8]}</a></li>'
        for i in range(_ri(5, 15, *key, "navn"))
    )
    paras = "".join(
        f"<p>{_paragraph(*key, 'body', i)}</p>"
        for i in range(_ri(1, 6, *key, "np"))
    )
    side = "".join(
        f'<a href="/s{i}">{_word(*key, "side", i)} {_word(*key, "side2", i)}</a><br/>'
        for i in range(_ri(3, 8, *key, "ns"))
    )
    title = _sentence(*key, "title")[:-1]
    return (
        f"<html><head><title>{title}</title></head><body>"
        f"<nav><ul>{nav}</ul></nav>"
        f"<h1>{title}</h1>"
        f"<div class=\"main\">{paras}</div>"
        f"<div class=\"sidebar\">{side}</div>"
        f"<footer><p>Copyright 2025 {_word(*key, 'corp').capitalize()} Inc. "
        f'<a href="/terms">Terms</a> <a href="/privacy">Privacy</a></p></footer>'
        f"</body></html>"
    )


def _payload_pdf(key: tuple) -> str:
    n_pages = _ri(1, 3, *key, "npg")
    doc_title = f"{_word(*key, 'doct').capitalize()} {_word(*key, 'doct2').capitalize()} Report"
    pages = []
    for pg in range(n_pages):
        paras = []
        for pa in range(_ri(1, 3, *key, "npp", pg)):
            text = _paragraph(*key, "pg", pg, "pa", pa)
            paras.append("\n".join(_hard_wrap(text, 70, *key, pg, pa)))
        body = "\n\n".join(paras)
        pages.append(f"{doc_title}\n\n{body}\n\nPage {pg + 1} of {n_pages}")
    return "\f".join(pages)


def _payload_mixed(key: tuple) -> str:
    heading = _sentence(*key, "mh")[:-1]
    para1 = _paragraph(*key, "mp1")
    w1, w2 = _word(*key, "b1"), _word(*key, "b2")
    para1 = f"{para1} This mentions <b>{w1}</b> and <a href=\"/x\">{w2}</a> inline."
    items = "\n".join(f"- {_sentence(*key, 'li', i)}" for i in range(_ri(3, 6, *key, "nli")))
    code = "\n".join(
        f"{_word(*key, 'cv', i)} = {_h64(*key, 'cn', i) % 1000}"
        for i in range(_ri(2, 4, *key, "ncl"))
    )
    para2 = f"Also **{_word(*key, 'emph')}** matters. {_paragraph(*key, 'mp2')}"
    return f"# {heading}\n\n{para1}\n\n{items}\n\n```\n{code}\n```\n\n{para2}\n"


def _payload_plain(key: tuple) -> str:
    return "\n\n".join(_paragraph(*key, "pp", i) for i in range(_ri(1, 3, *key, "npp")))


def make_payload(conv_id: str, turn_idx: int, seed: int = SEED) -> str:
    sel = _h64(seed, conv_id, turn_idx, "cls") % 100
    key = (seed, conv_id, turn_idx)
    if sel < 40:
        return _payload_html(key)
    if sel < 65:
        return _payload_pdf(key)
    if sel < 85:
        return _payload_mixed(key)
    return _payload_plain(key)


def conv_length(conv_id: str, seed: int = SEED) -> int:
    u = _u(seed, conv_id, "len")
    if u < 0.90:
        return _ri(2, 20, seed, conv_id, "len_s")
    if u < 0.99:
        return _ri(21, 200, seed, conv_id, "len_m")
    return _ri(200, 5000, seed, conv_id, "len_l")


def gen_conversation(i: int, seed: int = SEED) -> list[dict]:
    """All turns of conversation #i, deterministic and self-contained."""
    conv_id = f"conv{i:08d}"
    n_turns = conv_length(conv_id, seed)
    ts = BASE_TS + timedelta(seconds=_h64(seed, conv_id, "start") % (30 * 86400))
    rows: list[dict] = []
    prev_role = None
    for t in range(n_turns):
        if t == 0 and _u(seed, conv_id, "sys") < 0.10:
            role = "system"
        elif prev_role == "assistant" and _u(seed, conv_id, t, "tool?") < 0.15:
            role = "tool"
        elif prev_role in ("user", "system"):
            role = "assistant"
        else:
            role = "user"
        tool = TOOLS[_h64(seed, conv_id, t, "tool") % 4] if role == "tool" else None
        rows.append(
            {
                "conv_id": conv_id,
                "turn_idx": t,
                "role": role,
                "text": make_payload(conv_id, t, seed),
                "tool": tool,
                "ts": ts,
            }
        )
        ts += timedelta(seconds=_ri(5, 300, seed, conv_id, t, "gap"))
        prev_role = role
    return rows


def gen_pandas(n_convs: int, seed: int = SEED, start: int = 0) -> pd.DataFrame:
    """Conversations [start, start+n_convs) as a pandas DataFrame (tests)."""
    rows: list[dict] = []
    for i in range(start, start + n_convs):
        rows.extend(gen_conversation(i, seed))
    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    df["turn_idx"] = df["turn_idx"].astype("int32")
    return df
