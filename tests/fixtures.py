"""Deterministic tweet NDJSON fixture generator (FIXTURES.md §1).

Mirrors the shape the reference ingests (RawTweet.cs:6-60): nested JSON,
~20% extended_tweet, ~30% retweets from a small original-id pool, zipfy
hashtag/mention pools, a few invalid rows (missing timestamp), mild
event-time disorder.
"""

from __future__ import annotations

import json
import random

BASE_MS = 1704067200000  # 2024-01-01 00:00:00 UTC
SPAN_MS = 40 * 60 * 1000  # 40 minutes => several 10-min windows

SCREEN_NAMES = [f"user_{i}" for i in range(100)]
HASHTAGS = [f"tag{i}" for i in range(50)]
ORIGINAL_IDS = list(range(1000, 1030))


def _zipf_choice(rng: random.Random, pool: list, a: float = 1.5):
    # crude zipf: index ~ floor(u^(-1/(a-1))) - 1 clamped
    u = rng.random()
    idx = int(u ** (-1 / (a - 1))) - 1
    return pool[min(idx, len(pool) - 1)]


def make_tweets(n: int = 2000, seed: int = 42) -> list[str]:
    rng = random.Random(seed)
    lines = []
    for i in range(n):
        ts = BASE_MS + int(rng.random() * SPAN_MS)
        if rng.random() < 0.01:  # mild disorder: up to 5s backwards
            ts -= rng.randint(0, 5000)
        t: dict = {
            "id": 10_000_000 + i,
            "text": f"tweet {i} " + " ".join(
                f"#{_zipf_choice(rng, HASHTAGS)}" for _ in range(rng.randint(0, 2))
            ),
            "lang": "en" if rng.random() < 0.9 else "es",
            "timestamp_ms": str(ts),
            "user": {
                "screen_name": _zipf_choice(rng, SCREEN_NAMES),
                "followers_count": int(rng.paretovariate(1.2) * 100),
            },
            "entities": {
                "hashtags": [
                    {"text": _zipf_choice(rng, HASHTAGS)}
                    for _ in range(rng.randint(0, 5))
                ],
                "user_mentions": [
                    {"screen_name": _zipf_choice(rng, SCREEN_NAMES)}
                    for _ in range(rng.randint(0, 3))
                ],
            },
        }
        if rng.random() < 0.2:
            t["extended_tweet"] = {"full_text": f"extended text of tweet {i}"}
        if rng.random() < 0.3:
            t["retweeted_status"] = {
                "id": rng.choice(ORIGINAL_IDS),
                "extended_tweet": {"full_text": f"original {i}"},
            }
        if rng.random() < 0.005:  # invalid: no timestamp -> filtered (P4)
            del t["timestamp_ms"]
        lines.append(json.dumps(t))
    # a couple of outright garbage lines (unparseable)
    lines.append("not json at all")
    lines.append('{"id": "wrong-type"}')
    return lines


def write_tweets_file(path: str, n: int = 2000, seed: int = 42) -> int:
    lines = make_tweets(n, seed)
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return len(lines)


def make_tweets_skewed(
    n: int = 2000, seed: int = 42, hot_share: float = 0.5
) -> list[str]:
    """Viral-entity fixture: ``hot_share`` of all tweets mention the
    single entity ``viral_user`` (and carry ``#viral``), modelling the
    one-hot-key skew that blows up O(group) example-list state."""
    rng = random.Random(seed)
    lines = []
    for line in make_tweets(n, seed):
        try:
            t = json.loads(line)
        except json.JSONDecodeError:
            lines.append(line)
            continue
        if "entities" in t and rng.random() < hot_share:
            t["entities"]["user_mentions"] = [{"screen_name": "viral_user"}]
            t["entities"]["hashtags"] = [{"text": "viral"}]
        lines.append(json.dumps(t))
    return lines
