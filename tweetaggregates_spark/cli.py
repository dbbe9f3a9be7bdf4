"""CLI parity with the reference's five commands (Program.cs:11-18):

  saveAggregates <in.ndjson> <store_dir>   (file replay mode,
                                            Program.SaveAggregates.cs:31-39)
  saveTweets <in.ndjson> <out_dir>         (Program.SaveTweets.cs:14-51)
  printDB <store_dir>                      (Program.PrintDB.cs:12-46)
  repl <store_dir>                         (Program.Repl.cs:15-125)

The live-Twitter and Event Hubs commands (S1/S8) are out of scope — the
v1.1 API is retired; streaming ingest is streaming/pipeline.py over a
drop directory.

Usage: python -m tweetaggregates_spark.cli <command> <args...>
"""

from __future__ import annotations

import json
import sys

from tweetaggregates_spark.session import get_spark
from tweetaggregates_spark.store import FAMILIES, AggregateStore


def save_aggregates(in_path: str, store_dir: str) -> None:
    from tweetaggregates_spark.plans import tweets as tp

    spark = get_spark("saveAggregates")
    flat = tp.parse_tweets(spark.read.text(in_path)).persist()
    store = AggregateStore(spark, store_dir)
    for fam, df in tp.tweet_aggregates(flat).items():
        store.write(fam, df)
    flat.unpersist()
    print(f"wrote {len(FAMILIES)} aggregate families to {store_dir}")


def save_tweets(in_path: str, out_dir: str) -> None:
    spark = get_spark("saveTweets")
    spark.read.text(in_path).write.mode("overwrite").text(out_dir)
    print(f"saved raw tweets to {out_dir}")


def print_db(store_dir: str, n: int = 5) -> None:
    spark = get_spark("printDB")
    store = AggregateStore(spark, store_dir)
    for name, df in store.print_db(n).items():
        print(f"== {name}")
        for row in df.collect():
            print(json.dumps(row.asDict(recursive=True), default=str))


def repl(store_dir: str) -> None:
    """Q1-Q6 command loop (Program.Repl.cs:34-124)."""
    spark = get_spark("repl")
    store = AggregateStore(spark, store_dir)
    fam_by_cmd = {"topmentions": "mentions", "tophashtags": "hashtags",
                  "topretweets": "retweets"}
    print("commands: getsummary | getcounts s e | gettop{mentions,hashtags,"
          "retweets}string s e [entity] | getrecent<family>string n | exit")
    for line in sys.stdin:
        parts = line.strip().split()
        if not parts:
            continue
        cmd = parts[0].lower()
        try:
            if cmd == "exit":
                return
            elif cmd == "getsummary":
                df = store.get_summary()
            elif cmd == "getcounts":
                df = store.get_counts(parts[1], parts[2])
            elif cmd.startswith("gettop") and cmd.endswith("string"):
                fam = fam_by_cmd[cmd[len("gettop"):-len("string")]]
                entity = parts[3] if len(parts) > 3 else None
                df = store.get_top(fam, parts[1], parts[2], entity)
            elif cmd.startswith("getrecent"):
                key = cmd[len("getrecent"):].removesuffix("string")
                fam = fam_by_cmd.get(key, "counts" if key == "counts" else key)
                df = store.get_recent(fam, int(parts[1]))
            else:
                print(f"unknown command: {cmd}")
                continue
            for row in df.collect():
                print(json.dumps(row.asDict(recursive=True), default=str))
        except Exception as e:  # noqa: BLE001
            print(f"error: {e}")


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    cmd = sys.argv[1]
    if cmd == "saveAggregates":
        save_aggregates(sys.argv[2], sys.argv[3])
    elif cmd == "saveTweets":
        save_tweets(sys.argv[2], sys.argv[3])
    elif cmd == "printDB":
        print_db(sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 5)
    elif cmd == "repl":
        repl(sys.argv[2])
    else:
        print(__doc__)
        return 2
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
