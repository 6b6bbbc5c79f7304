"""Microbenchmark suite with per-row checkpoint/resume.

Capability parity with /root/reference/benchmark/main_benchmark.cpp:
encoder grids over N x CRC x systematic (:273-369) and decoder grids over
implementation x N x L x CRC (:371-503), reporting the same `CodeThr` /
`InfoThr` counters (coded / info bits per second, :233-239) plus
blocks-per-second. Results go to stdout and a JSON-lines file.

    python -m polar_codes_tpu.sim.benchmark --quick -o benchmarks.jsonl

Rows are enumerated declaratively up front and the output file doubles as
the checkpoint: on restart, rows whose `bench` name already appears in the
output are skipped, and new rows are appended.  The tunneled TPU worker
can crash mid-grid (CLAUDE.md); rerunning the same command resumes at the
first missing row instead of truncating the artifact, and `--loop` keeps
re-spawning the grid in a child process until every row is done.

Timing uses the chained-fori_loop device timer (utils/timing.py), so the
numbers are decode/encode wall time on the device, batch included.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np


def bits_budget_batch(n_len: int, budget_bits: int = 1 << 21) -> int:
    """One consistent batch policy for every row: ~budget_bits coded bits
    per timed step, clamped to [64, 2048] (large batches destabilize the
    tunneled dev worker; see CLAUDE.md)."""
    return int(np.clip(budget_bits // n_len, 64, 2048))


def enumerate_rows(quick: bool):
    """Declarative grid: list of dicts describing every benchmark row.

    Mirrors main_benchmark.cpp dimension-for-dimension: encode N in
    {64..131072} x CRC/CMAC x systematic x dSNR (:273-369), Fast-SSC N in
    {64..8192} x {float,char}, CA-SCL N in {256..8192} x L in {1..32} x
    CRC in {0,8,16,32} x {float,char}, SCAN (:371-503). The reference
    sweeps every cross product; here each dimension is swept around the
    flagship shape (N=1024 L=8 CRC16) so the grid stays one TPU pass.
    """
    rows = []
    enc_ns = [256, 1024, 4096] if quick else [64, 256, 1024, 4096, 16384,
                                              32768, 131072]
    for n_len in enc_ns:
        for c_bits in ([0, 32] if quick else [0, 8, 16, 32]):
            if c_bits >= n_len // 2:
                continue
            rows.append(dict(kind="encode", N=n_len, K=n_len // 2,
                             C=c_bits, L=0, dtype="float"))

    if not quick:
        # CMAC tail rows (main_benchmark.cpp:330-340: cmac x {8..64} at
        # N=1024) and the systematic / design-SNR encode dimensions
        for c_bits in (8, 16, 32, 64):
            rows.append(dict(kind="encode", N=1024, K=512, C=c_bits,
                             L=0, dtype="float", det="cmac"))
        for n_len in (1024, 32768):
            rows.append(dict(kind="encode", N=n_len, K=n_len // 2, C=16,
                             L=0, dtype="float", systematic=False))
        rows.append(dict(kind="encode", N=1024, K=512, C=16, L=0,
                         dtype="float", dsnr=4.0))

    # encode: fast path — all-stage VMEM kernel at N<=2048, MXU-factored
    # GF(2) matmuls beyond (no VMEM/compile ceiling; ops/butterfly.py)
    enc_fast_ns = ([256, 1024] if quick
                   else [256, 1024, 4096, 8192, 32768, 131072])
    for n_len in enc_fast_ns:
        rows.append(dict(kind="encode", N=n_len, K=n_len // 2,
                         C=16, L=0, dtype="pallas"))

    dec_ns = ([256, 1024] if quick
              else [64, 128, 256, 512, 1024, 2048, 4096, 8192])
    for n_len in dec_ns:
        for tag in ("float", "char"):
            rows.append(dict(kind="fastssc", N=n_len, K=n_len // 2,
                             C=0, L=1, dtype=tag))
    # Fast-SSC fused-kernel variants (float, and char-on-bf16)
    for n_len in [n for n in dec_ns if n >= 256]:
        for tag in ("pallas", "pallas_char"):
            rows.append(dict(kind="fastssc", N=n_len, K=n_len // 2,
                             C=0, L=1, dtype=tag))

    scl_ls = [2, 8] if quick else [1, 2, 4, 8, 16, 32]
    for n_len in ([1024] if quick else [256, 1024, 4096]):
        for list_size in scl_ls:
            for tag in ("float", "char", "pallas", "pallas_char"):
                if (n_len == 4096 and list_size > 8
                        and not tag.startswith("pallas")):
                    continue  # XLA-unroll compile guard; pallas runs all L
                if tag.startswith("pallas") and list_size == 1:
                    continue  # L=1 delegates to Fast-SSC (same program)
                if tag == "pallas_char" and (
                        list_size != 8 or n_len == 256):
                    continue  # char kernel rows at (1024, 8) + (4096, 8)
                rows.append(dict(kind="cascl", N=n_len, K=n_len // 2,
                                 C=16, L=list_size, dtype=tag))

    if not quick:
        # N=8192 decode rows (main_benchmark.cpp:494-503)
        for list_size in (2, 8):
            rows.append(dict(kind="cascl", N=8192, K=4096, C=16,
                             L=list_size, dtype="float"))
        rows.append(dict(kind="cascl", N=8192, K=4096, C=16, L=8,
                         dtype="pallas"))
        # CRC breadth at the flagship shape (the reference crosses
        # CRC in {0,8,16,32} with every decode row)
        for c_bits in (0, 8, 32):
            for tag in ("float", "pallas"):
                rows.append(dict(kind="cascl", N=1024, K=512, C=c_bits,
                                 L=8, dtype=tag))
        # systematic=0 and design-SNR decode dimensions
        for tag in ("float", "pallas"):
            rows.append(dict(kind="cascl", N=1024, K=512, C=16, L=8,
                             dtype=tag, systematic=False))
        rows.append(dict(kind="cascl", N=1024, K=512, C=16, L=8,
                         dtype="float", dsnr=4.0))
        # decode-N breadth: the reference crosses EVERY N in {64..8192}
        # with its L grid (main_benchmark.cpp:371-503); L in {2,8} plus a
        # char row fill the Ns the r4 grid skipped
        for n_len in (64, 128, 512, 2048):
            for list_size in (2, 8):
                rows.append(dict(kind="cascl", N=n_len, K=n_len // 2,
                                 C=16, L=list_size, dtype="float"))
            rows.append(dict(kind="cascl", N=n_len, K=n_len // 2, C=16,
                             L=8, dtype="char"))
            if n_len >= 512:  # qualified pallas envelope starts at 256
                rows.append(dict(kind="cascl", N=n_len, K=n_len // 2,
                                 C=16, L=8, dtype="pallas"))
        # construction variant (the reference benchmarks BE separately:
        # main_benchmark.cpp:460 — the frozen set changes the specialized
        # tree, so throughput differs from BB), across L and on the
        # pallas arm (r4 had BE only at float L=8)
        for list_size in (2, 8, 16, 32):
            rows.append(dict(kind="cascl", N=1024, K=512, C=16,
                             L=list_size, dtype="float", ctor="BE"))
        rows.append(dict(kind="cascl", N=1024, K=512, C=16, L=8,
                         dtype="pallas", ctor="BE"))
        rows.append(dict(kind="fastssc", N=1024, K=512, C=0, L=1,
                         dtype="float", ctor="BE"))
        # rate sweep: the reference sweeps K per N (:273-369); beyond the
        # flagship-N sweep, cover a low and high rate at N=256/4096 and
        # put the flagship K variants on the pallas arm too
        for k_len in (256, 768):
            for tag in ("float", "pallas"):
                rows.append(dict(kind="cascl", N=1024, K=k_len, C=16, L=8,
                                 dtype=tag))
        for n_len, ks in ((256, (64, 192)), (4096, (1024, 3072))):
            for k_len in ks:
                rows.append(dict(kind="cascl", N=n_len, K=k_len, C=16,
                                 L=8, dtype="float"))
        # pcsim "compareall" families (simulator.cpp:404-491): adaptive
        # fast->SCL escalation, SCFlip depth-first, Fast-SSCAN — so every
        # family PERF.md discusses has an artifact-backed row
        for tag in ("float", "pallas"):
            rows.append(dict(kind="adaptive", N=1024, K=512, C=16, L=8,
                             dtype=tag))
        rows.append(dict(kind="depthfirst", N=1024, K=512, C=16, L=8,
                         dtype="float"))
        for n_len in (256, 1024):
            rows.append(dict(kind="fastsscan", N=n_len, K=n_len // 2,
                             C=0, L=4, dtype="float"))

    for n_len in ([1024] if quick else [256, 1024]):
        rows.append(dict(kind="scan", N=n_len, K=n_len // 2, C=0, L=4,
                         dtype="float"))
    if not quick:
        # fused all-sweeps VMEM SCAN kernel (ops/scan_kernel.py)
        rows.append(dict(kind="scan", N=1024, K=512, C=0, L=4,
                         dtype="pallas"))

    if not quick:
        # scan-over-schedule decoders at block lengths beyond the unrolled
        # trees' compile budget (main_benchmark.cpp runs N up to 131072)
        for n_len in (32768, 131072):
            for tag in ("float", "pallas"):
                rows.append(dict(kind="sc_scan", N=n_len, K=n_len // 2,
                                 C=0, L=1, dtype=tag))
        for tag in ("float", "pallas"):
            rows.append(dict(kind="cascl_scan", N=32768, K=16384,
                             C=16, L=8, dtype=tag))
        # the design-scales claim measured: SCL at the largest encode N
        rows.append(dict(kind="cascl_scan", N=131072, K=65536, C=16,
                         L=8, dtype="pallas"))
    for row in rows:
        row["bench"] = row_name(row)
    return rows


def row_name(row):
    kind, n_len = row["kind"], row["N"]
    suffix = ""
    if row.get("ctor", "BB") != "BB":
        suffix += f"_{row['ctor'].lower()}"
    if kind in ("cascl", "fastssc") and row["K"] != n_len // 2:
        suffix += f"_k{row['K']}"
    # non-default grid dimensions get explicit name suffixes
    if not row.get("systematic", True):
        suffix += "_nonsys"
    if row.get("dsnr", 0.0):
        suffix += f"_dsnr{int(round(row['dsnr'] * 100))}"
    if kind == "cascl" and row["C"] != 16:
        suffix += f"_crc{row['C']}"
    if suffix and kind == "encode":
        det = row.get("det", "crc")
        return f"encode_n{n_len}_{det}{row['C']}" + suffix
    if kind == "encode" and row.get("det", "crc") != "crc":
        return f"encode_n{n_len}_{row['det']}{row['C']}"
    if suffix:
        base = (f"cascl_{row['dtype']}_n{n_len}" if kind == "cascl"
                else f"fastssc_{row['dtype']}_n{n_len}")
        if kind == "cascl":
            base += f"_l{row['L']}"
        return base + suffix
    if kind == "encode":
        if row["dtype"] == "pallas":
            return f"encode_pallas_n{n_len}_crc{row['C']}"
        return f"encode_n{n_len}_crc{row['C']}"
    if kind == "fastssc":
        return f"fastssc_{row['dtype']}_n{n_len}"
    if kind == "sc_scan":
        return f"sc_scan_{row['dtype']}_n{n_len}"
    if kind == "cascl":
        return f"cascl_{row['dtype']}_n{n_len}_l{row['L']}"
    if kind == "cascl_scan":
        return f"cascl_scan_{row['dtype']}_n{n_len}_l{row['L']}"
    if kind == "adaptive":
        return f"adaptive_{row['dtype']}_n{n_len}_l{row['L']}"
    if kind == "depthfirst":
        return f"depthfirst_n{n_len}_t{row['L']}"
    if kind == "fastsscan":
        return f"fastsscan_n{n_len}_i{row['L']}"
    if row["dtype"] == "pallas":
        return f"scan{row['L']}_pallas_n{n_len}"
    return f"scan{row['L']}_n{n_len}"


def load_done(path):
    """Bench names that need no further runs: measured rows, plus rows
    that failed deterministically twice (one retry covers worker-crash
    flakes; a second identical failure would loop forever under --loop)."""
    done, errors = set(), {}
    if path and os.path.exists(path):
        with open(path) as fh:
            for line in fh:
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if "bench" not in rec:
                    continue
                if "error" in rec:
                    errors[rec["bench"]] = errors.get(rec["bench"], 0) + 1
                else:
                    done.add(rec["bench"])
    done.update(b for b, n in errors.items() if n >= 2)
    return done


def run_row(row, batch_bits, out):
    import jax
    import jax.numpy as jnp

    from ..construction import frozen_bits
    from ..models.encoder import PolarEncoder
    from ..models.fastssc import FastSSCDecoder
    from ..models.scl import SCLDecoder
    from ..models.scan import ScanDecoder
    from ..models.detectors import make_detector
    from ..utils.timing import time_device_fn
    from ..utils.profiling import roofline

    rng = np.random.default_rng(0)
    platform = jax.devices()[0].platform
    n_len, k_len = row["N"], row["K"]
    batch = bits_budget_batch(n_len, batch_bits)
    kind = row["kind"]
    if kind == "cascl" and row.get("L", 0) >= 16:
        # measured knee (v5e, N=1024): B=2048 at L>=16 runs ~12% slower
        # than B=1024 — the [L, span, B] working set outgrows what the
        # batch amortizes
        batch = min(batch, 1024)

    if kind == "encode":
        det = (make_detector(row["C"], row.get("det", "crc"))
               if row["C"] else None)
        frozen = frozen_bits(n_len, k_len, row.get("dsnr", 0.0),
                             row.get("ctor", "BB"))
        enc = PolarEncoder(
            n_len, frozen, systematic=row.get("systematic", True),
            detector=det,
            backend="pallas" if row["dtype"] == "pallas" else "xla",
        )
        bits = jnp.asarray(rng.integers(0, 2, (batch, k_len)), jnp.uint8)
        if row.get("det") == "cmac":
            # AES-CMAC is host work in the reference too (cmac.cpp runs
            # on the CPU); the axon backend cannot run host callbacks
            # inside device programs, so the row times host CMAC
            # (numpy) + device butterfly encode and reports the sum.
            import time as _time

            bits_np = np.asarray(bits)
            t0 = _time.perf_counter()
            tails = det.tags_batch(bits_np[:, : k_len - det.tail_bits])
            host_secs = _time.perf_counter() - t0
            bits = jnp.asarray(
                np.concatenate(
                    [bits_np[:, : k_len - det.tail_bits], tails], axis=1
                )
            )
            dev = time_device_fn(
                lambda x: enc.encode(x, generate_crc=False), bits, reps=8
            )
            secs = host_secs + dev
            roof = roofline(
                lambda x: enc.encode(x, generate_crc=False), bits,
                seconds=dev, model=enc, batch=batch,
            )
        else:
            secs = time_device_fn(lambda x: enc.encode(x), bits, reps=8)
            roof = roofline(lambda x: enc.encode(x), bits, seconds=secs,
                            model=enc, batch=batch)
    else:
        frozen = frozen_bits(n_len, k_len, row.get("dsnr", 0.0),
                             row.get("ctor", "BB"))
        dtype = (jnp.int8 if row["dtype"] in ("char", "pallas_char")
                 else jnp.float32)
        if kind in ("sc_scan", "cascl_scan"):
            from ..models.large import LargeSCDecoder, LargeSCLDecoder

            # the scan decoders execute O(N) tiny sequential ops and are
            # dispatch-bound, not bandwidth-bound — batch is nearly free
            # throughput up to a working-set knee (measured N=131072
            # pallas after the cond/switch stage refresh: B=128 1038,
            # B=256 658 Mbit/s coded), so give the SC rows 8x the bit
            # budget clamped to that knee (timed window stays <=0.2 s,
            # the worker-crash bound from CLAUDE.md)
            if kind == "sc_scan":
                batch = min(max(8 * batch_bits // n_len, 32), 256)
                dec = LargeSCDecoder(
                    n_len, frozen, systematic=True, dtype=dtype,
                    backend=("pallas" if row["dtype"] == "pallas"
                             else "xla"))
            else:
                # deferred-perm SCL scan: B=128 marginally beats B=64 at
                # N=32768 (12.8 vs 11.5 Mbit/s payload). The pallas row
                # runs the r4 production configuration: bf16 stage-LLR
                # carry (BLER-identical in the paired A/B, VALIDATION.md)
                batch = min(max(2 * batch_bits // n_len, 16), 128)
                det = make_detector(row["C"], "crc")
                pallas = row["dtype"] == "pallas"
                # XLA arm: unroll=16 inlines 16 unrolled ~2*chunk-op
                # chunk bodies per scan step — the tunneled remote
                # compiler hangs on the module (observed r4); 4 keeps
                # the module within what it builds while still removing
                # 3/4 of the per-step cond copies
                dec = LargeSCLDecoder(n_len, frozen, list_size=row["L"],
                                      systematic=True, detector=det,
                                      dtype=dtype,
                                      backend="pallas" if pallas else "xla",
                                      unroll=(16 if pallas else 4),
                                      carry_dtype=(jnp.bfloat16 if pallas
                                                   else None))
        elif kind == "adaptive":
            # pcsim compareall family: realistic 2 dB input (the adaptive
            # scheme's throughput IS its operating-point failure rate;
            # synthetic noise would escalate every block). Timing is the
            # device-true composite: fast pass at B plus each SCL stage
            # rerun at the REAL bucket size the decode produced — the sum
            # of the kernels the host-orchestrated decode launches.
            from ..models.adaptive import AdaptiveDecoder
            from ..dsp import bpsk_modulate, add_awgn

            det = make_detector(row["C"], "crc")
            backend = ("pallas" if row["dtype"].startswith("pallas")
                       else "xla")
            dec = AdaptiveDecoder(n_len, frozen, list_size=row["L"],
                                  systematic=True, detector=det,
                                  backend=backend)
            enc2 = PolarEncoder(n_len, frozen, systematic=True,
                                detector=det, backend="xla")
            info_b = jnp.asarray(rng.integers(0, 2, (batch, k_len)),
                                 jnp.uint8)
            code = enc2.encode(info_b)
            esn0 = 10.0 ** 0.2 * k_len / n_len
            llr = jax.device_put(add_awgn(
                jax.random.PRNGKey(2), bpsk_modulate(code),
                esn0_linear=esn0))
            secs = time_device_fn(lambda x: dec._fast_fn(x)[2], llr,
                                  reps=8)
            cur_ok = np.array(dec._fast_fn(llr)[2])  # writable copy
            flat_np = np.asarray(llr)
            for stage_fn in dec._stage_fns:
                failed = np.nonzero(~cur_ok)[0]
                if not failed.size:
                    break
                bucket = min(1 << int(failed.size - 1).bit_length(),
                             batch)
                idx = np.zeros(bucket, np.int32)
                idx[: failed.size] = failed
                sub = jax.device_put(flat_np[idx])
                secs += time_device_fn(
                    lambda x, f=stage_fn: f(x)[2], sub, reps=8
                )
                cur_ok[failed] = np.asarray(stage_fn(sub)[2])[
                    : failed.size]
            rec = dict(bench=row["bench"], N=n_len, K=k_len, C=row["C"],
                       L=row["L"], dtype=row["dtype"], batch=batch,
                       platform=platform, seconds_per_batch=secs,
                       code_thr_mbps=batch * n_len / secs / 1e6,
                       info_thr_mbps=batch * k_len / secs / 1e6,
                       blocks_per_s=batch / secs,
                       escalated_frac=float(
                           (~np.asarray(dec._fast_fn(llr)[2])).mean()))
            line = json.dumps(rec)
            print(line, flush=True)
            if out:
                out.write(line + "\n")
                out.flush()
            return
        elif kind == "depthfirst":
            from ..models.depthfirst import DepthFirstDecoder

            dec = DepthFirstDecoder(
                n_len, frozen, systematic=True,
                detector=make_detector(row["C"], "crc"),
                trial_limit=row["L"],
            )
        elif kind == "fastsscan":
            from ..models.scan import FastSScanDecoder

            dec = FastSScanDecoder(n_len, frozen, systematic=True,
                                   iterations=row["L"])
        elif kind == "fastssc":
            backend = ("pallas" if row["dtype"].startswith("pallas")
                       else "xla")
            dec = FastSSCDecoder(n_len, frozen, systematic=True, dtype=dtype,
                                 backend=backend)
        elif kind == "cascl":
            # C=0: no detector — pure ML list selection (the reference's
            # parity_size=0 grid dimension)
            det = make_detector(row["C"], "crc") if row["C"] else None
            backend = ("pallas" if row["dtype"].startswith("pallas")
                       else "xla")
            dec = SCLDecoder(n_len, frozen, list_size=row["L"],
                             systematic=row.get("systematic", True),
                             detector=det, dtype=dtype,
                             backend=backend)
        else:
            dec = ScanDecoder(n_len, frozen, systematic=True,
                              iterations=row["L"],
                              backend=("pallas" if row["dtype"] == "pallas"
                                       else "xla"))
        llr = jnp.asarray(rng.normal(0, 2, (batch, n_len)), jnp.float32)
        if dtype == jnp.int8:
            llr = jnp.clip(jnp.round(llr * 8), -127, 127).astype(jnp.int8)
        llr = jax.device_put(llr)
        secs = time_device_fn(lambda x: dec.decode(x), llr, reps=8)
        roof = roofline(lambda x: dec.decode(x), llr, seconds=secs,
                        model=dec, batch=batch)

    rec = dict(bench=row["bench"], N=n_len, K=k_len, C=row["C"], L=row["L"],
               dtype=row["dtype"], batch=batch, platform=platform,
               seconds_per_batch=secs,
               code_thr_mbps=batch * n_len / secs / 1e6,
               info_thr_mbps=batch * k_len / secs / 1e6,
               blocks_per_s=batch / secs)
    for key in ("flops", "bytes_accessed", "mfu", "hbm_util", "bound",
                "cost_model"):
        if key in roof:
            rec[key] = roof[key]
    line = json.dumps(rec)
    print(line, flush=True)
    if out:
        out.write(line + "\n")
        out.flush()


def main(argv=None):
    p = argparse.ArgumentParser(prog="polar-bench", description=__doc__)
    p.add_argument("--quick", action="store_true",
                   help="smaller grids (a few minutes)")
    p.add_argument("--filter", default="",
                   help="only run benchmarks whose name contains this")
    p.add_argument("-o", "--output", default="benchmarks.jsonl")
    p.add_argument("--platform", default="auto", choices=["auto", "cpu"])
    p.add_argument("--batch-bits", type=int, default=1 << 21,
                   help="approximate coded bits per timed step")
    p.add_argument("--fresh", action="store_true",
                   help="ignore existing output rows (no resume)")
    p.add_argument("--loop", action="store_true",
                   help="re-spawn the grid in child processes until every "
                        "row is present (survives TPU worker crashes)")
    p.add_argument("--list", action="store_true", dest="list_rows",
                   help="print the row names and exit")
    args = p.parse_args(argv)

    rows = enumerate_rows(args.quick)
    if args.filter:
        rows = [r for r in rows if args.filter in r["bench"]]
    if args.list_rows:
        for row in rows:
            print(row["bench"])
        return 0

    if args.loop:
        # Parent loop: child runs resume from the output file, so a worker
        # crash costs only the in-flight row.
        child_args = [sys.argv[0] if argv is None else "-m"]
        cmd = [sys.executable, "-m", "polar_codes_tpu.sim.benchmark",
               "-o", args.output, "--batch-bits", str(args.batch_bits)]
        if args.quick:
            cmd.append("--quick")
        if args.filter:
            cmd += ["--filter", args.filter]
        if args.platform == "cpu":
            cmd += ["--platform", "cpu"]
        for attempt in range(len(rows) + 4):
            missing = [r for r in rows
                       if r["bench"] not in load_done(args.output)]
            if not missing:
                print(f"all {len(rows)} rows complete", flush=True)
                return 0
            print(f"[loop {attempt}] {len(missing)} rows missing; "
                  f"next: {missing[0]['bench']}", flush=True)
            ret = subprocess.run(cmd).returncode
            if ret != 0:
                time.sleep(150)  # TPU worker recovery window (CLAUDE.md)
        print("loop budget exhausted", file=sys.stderr)
        return 1

    if args.fresh and args.output and os.path.exists(args.output):
        os.unlink(args.output)
    done = load_done(args.output)

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

    out = open(args.output, "a") if args.output else None
    try:
        for row in rows:
            if row["bench"] in done:
                continue
            try:
                run_row(row, args.batch_bits, out)
            except Exception as exc:  # noqa: BLE001
                if ("UNAVAILABLE" in str(exc)
                        or "TPU backend error" in str(exc)
                        or "DEADLINE_EXCEEDED" in str(exc)):
                    # worker loss/crash: every later row would error
                    # instantly and poison the checkpoint — exit so
                    # --loop waits out the recovery window and resumes
                    raise
                # deterministic row failure (e.g. a kernel rejected by
                # Mosaic): record it and keep the rest of the grid going
                line = json.dumps(dict(
                    bench=row["bench"],
                    error=f"{type(exc).__name__}: {exc}"[:500],
                ))
                print(line, flush=True)
                if out:
                    out.write(line + "\n")
                    out.flush()
    finally:
        if out:
            out.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
