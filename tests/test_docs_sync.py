"""Bench-artifact drift check (VERDICT round-4 #7): the generated
`<!-- bench:begin -->` blocks in the docs must match the LATEST committed
BENCH_r*.json exactly — `make sync-bench` is the only writer."""

import pathlib
import re

from dctz_tpu.tools import sync_bench

ROOT = pathlib.Path(__file__).resolve().parents[1]


def test_bench_blocks_match_latest_capture():
    src, parsed = sync_bench.latest_bench()
    want = sync_bench.block(src, parsed)
    pat = re.compile(
        re.escape(sync_bench.BEGIN) + r".*?" + re.escape(sync_bench.END),
        re.S,
    )
    for rel in sync_bench.FILES:
        text = (ROOT / rel).read_text()
        m = pat.search(text)
        assert m, f"{rel}: missing bench block"
        assert m.group(0) == want, (
            f"{rel}: bench block drifted from {src} — run `make sync-bench`"
        )
