"""Sync the headline benchmark block in the docs from the latest
BENCH_r*.json driver capture — the single source of truth (`make
sync-bench`). Every file carries one generated block between
`<!-- bench:begin -->` / `<!-- bench:end -->` markers; everything outside
the markers is untouched."""

from __future__ import annotations

import json
import pathlib
import re
import sys

ROOT = pathlib.Path(__file__).resolve().parents[2]
FILES = ["BASELINE.md", "README.md", "docs/benchmarks.md"]
BEGIN, END = "<!-- bench:begin -->", "<!-- bench:end -->"


def latest_bench() -> tuple[str, dict]:
    caps = sorted(ROOT.glob("BENCH_r*.json"))
    if not caps:
        sys.exit("no BENCH_r*.json found")
    path = caps[-1]
    return path.name, json.loads(path.read_text())["parsed"]


def block(src: str, p: dict) -> str:
    d = p["detail"]["jax"]
    base = p["detail"]["native_cpu_baseline"]
    lines = [
        BEGIN,
        f"Driver capture `{src}` (the single source of truth — regenerate "
        "this block with `make sync-bench`):",
        "",
        f"* **{p['value']} {p['unit']}** — {p['metric']}",
        f"* compress {d['compress_gbps']:.2f} GB/s / decompress "
        f"{d['decompress_gbps']:.2f} GB/s; ratio **{d['ratio']:.2f}** "
        f"(native CPU baseline: {base['gbps']:.3f} GB/s at ratio "
        f"{base['ratio']:.2f}) — **{p['vs_baseline']:.1f}x**",
        f"* bound satisfied on the full array: "
        f"**{d['bound_satisfied_full_array']}**"
        + (f" (verify-on config)" if d.get("verify") else ""),
        f"* stages per 128 MB: device {d['device_compress_ms_amortized']} ms"
        f" enc / {d['device_decompress_ms_amortized']} ms dec; host "
        f"{d['host_compress_ms']} ms enc / {d['host_decompress_ms']} ms dec"
        + (
            f"; strictly-serial monolithic sum {d['serial_sum_gbps']} GB/s"
            if "serial_sum_gbps" in d
            else ""
        ),
        END,
    ]
    return "\n".join(lines)


def main() -> None:
    src, parsed = latest_bench()
    blk = block(src, parsed)
    pat = re.compile(re.escape(BEGIN) + r".*?" + re.escape(END), re.S)
    for rel in FILES:
        f = ROOT / rel
        text = f.read_text()
        if BEGIN not in text:
            sys.exit(f"{rel}: missing {BEGIN} marker")
        f.write_text(pat.sub(blk, text))
        print(f"synced {rel} from {src}")


if __name__ == "__main__":
    main()
