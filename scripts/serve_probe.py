"""On-chip probe: serving aggregate tok/s across slot counts / KV dtypes.

Runs bench.run_serving_bench configs sequentially in ONE process (the
tunneled TPU charges a multi-minute first-execute tax per process, NOTES
"Round 3 environment findings"). Each config builds and frees its own
full-depth w8a8 params.

    timeout 3600 python scripts/serve_probe.py 12:0 24:1 16:1
"""

import gc
import sys
import traceback

sys.path.insert(0, ".")
from bench import run_serving_bench  # noqa: E402


def main():
    specs = sys.argv[1:] or ["12:0", "24:1"]
    for spec in specs:
        slots_s, kvq_s = spec.split(":")
        slots, kvq = int(slots_s), bool(int(kvq_s))
        try:
            tok_s, total, elapsed = run_serving_bench(
                28, "w8a8", slots=slots, kv_quant=kvq
            )
            print(
                f"RESULT slots={slots} kv_quant={int(kvq)} "
                f"tok_s={tok_s:.1f} tokens={total} elapsed={elapsed:.2f}",
                flush=True,
            )
        except Exception as e:
            print(f"FAIL slots={slots} kv_quant={int(kvq)} {e!r}", flush=True)
            traceback.print_exc()
        gc.collect()


if __name__ == "__main__":
    main()
