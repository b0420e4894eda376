"""Benchmark harness (reference benches/multi_stark.rs).

Workloads:
  u32_add (default): the 2-circuit U32Add + preprocessed ByteTable system,
      FRI params log_blowup=2, cap_height=0, 100 queries, max_log_arity=1,
      PoW 10+10 bits — exactly the reference bench configuration
      (benches/multi_stark.rs:244-258), swept over trace heights like the
      reference's 2^12/2^13/2^14 criterion groups (multi_stark.rs:272-328).
  blake3: the 10-circuit compression-family flagship driven by the real
      hasher — every compression claim from hashing a BENCH_MSG_KIB-KiB
      message (reference blake3.rs:2216-2340).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "sizes"}.
The headline value is the best warm prove at the LARGEST size; "sizes"
carries the full sweep (prove best/median, verify, proof bytes, peak RSS,
per-span breakdown).  vs_baseline is null: the reference publishes no
numbers and no Rust toolchain exists here (BASELINE.md) — it stays null
until a measured baseline lands.  Extra diagnostics go to stderr.

Env knobs:
  BENCH_WORKLOAD  u32_add | blake3            (default u32_add)
  BENCH_SIZES     comma list of log2 heights  (default BENCH_LOG_N or 14)
  BENCH_LOG_N     single-size back-compat knob
  BENCH_ITERS     measured iterations         (default 3)
  BENCH_VERIFY    also time verification      (default 1)
  BENCH_MSG_KIB   blake3 message size in KiB  (default 4)
"""

import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

# honor MULTISTARK_PLATFORM before jax initializes (main() touches jax
# before the package import would apply it; without this a CPU-forced bench
# still initializes the axon TPU plugin and hangs if the tunnel is down)
if os.environ.get("MULTISTARK_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", os.environ["MULTISTARK_PLATFORM"])
else:
    # The axon TPU plugin tunnels through local ports; if the remote-compile
    # endpoint is unreachable, jax initialization blocks forever.  Probe it
    # and fall back to CPU (clearly labelled in the output) so the bench
    # always produces a result.
    import socket

    def _tunnel_up(port=8083, timeout=3.0) -> bool:
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=timeout):
                return True
        except OSError:
            return False

    if not _tunnel_up():
        log_msg = "bench: TPU tunnel unreachable (port 8083); falling back to CPU"
        print(log_msg, file=sys.stderr, flush=True)
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")
        _TUNNEL_FALLBACK = True
    else:
        _TUNNEL_FALLBACK = False



def log(*args):
    print(*args, file=sys.stderr, flush=True)


def peak_rss_mib() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def reference_fri_params():
    from multistark_tpu.config import CommitmentParameters, FriParameters

    return (
        CommitmentParameters(log_blowup=2, cap_height=0),
        FriParameters(
            log_final_poly_len=0,
            max_log_arity=1,
            num_queries=100,
            commit_proof_of_work_bits=10,
            query_proof_of_work_bits=10,
        ),
    )


def u32_add_case(log_n: int):
    """The reference bench workload at height 2^log_n
    (benches/multi_stark.rs:73-165: U32Add + preprocessed ByteTable)."""
    from multistark_tpu.configs import GoldilocksBlake3Config
    from multistark_tpu.system import System
    from multistark_tpu.test_circuits import u32_add_system_inputs, u32_add_witness

    commit, fri = reference_fri_params()
    config = GoldilocksBlake3Config(commit, fri)
    system, key = System.new(config, u32_add_system_inputs())
    n = 1 << log_n
    rng = np.random.default_rng(0xDEADBEEF)
    xs = rng.integers(0, 1 << 32, n, dtype=np.uint64)
    ys = rng.integers(0, 1 << 32, n, dtype=np.uint64)
    traces, claims = u32_add_witness(list(zip(xs.tolist(), ys.tolist())), n)
    return config, system, key, traces, claims


def blake3_case(msg_kib: int):
    """The hasher-driven 10-circuit flagship: all compression claims from
    hashing a msg_kib-KiB message (reference blake3.rs:2216-2340)."""
    from multistark_tpu.configs import GoldilocksBlake3Config
    from multistark_tpu.system import System
    from multistark_tpu.test_circuits.blake3_circuit import (
        blake3_hasher_witness,
        blake3_system_inputs,
    )

    commit, fri = reference_fri_params()
    config = GoldilocksBlake3Config(commit, fri)
    system, key = System.new(config, blake3_system_inputs(limb_bits=8))
    data = bytes(i % 251 for i in range(msg_kib * 1024))
    digest, traces, claims = blake3_hasher_witness(data, limb_bits=8)
    log(f"blake3 workload: {msg_kib} KiB message -> {len(claims)} compression claims, "
        f"trace heights {[t.shape[0] for t in traces]}")
    return config, system, key, traces, claims


def analytic_ops(system, heights):
    """NTT butterflies + Merkle hash compressions per prove, from the
    reference's analytic cost model (src/prover.rs:155-178, transcribed in
    multistark_tpu/prover.py:9-23).  Counts per ACTIVE circuit of height n,
    blowup B=2^b, widths (W1 main, W2 stage-2, q·D quotient):

      NTT  : commit transform per column = n/2·log n (iDFT) +
             nB/2·log(nB) (padded forward DFT); quotient adds the in-kernel
             coset iDFT at m=n·q over D columns; FRI folds add the geometric
             pair-fold tail Σ_r N/2^r.
      hash : one leaf hash per LDE row per matrix + ~N_max internal
             compressions per tree (mixed heights inject at their level),
             incl. the FRI commit-phase trees (height halves per round).

    Returns (ntt_butterflies, merkle_hashes); both are exact-shape counts,
    not measurements — Gops/s = (ntt+hash)/wall/1e9."""
    cfg = system.config
    b = cfg.commitment_parameters.log_blowup
    D = cfg.extension_params.degree
    ntt = 0
    hashes = 0
    lde_heights = []
    for c, n in zip(system.circuits, heights):
        if n == 0:
            continue
        log_n = n.bit_length() - 1
        N = n << b
        log_N = log_n + b

        def commit_cols(w):
            return w * ((n // 2) * log_n + (N // 2) * log_N)

        q = c.quotient_degree
        m = n * q
        ntt += commit_cols(c.main_width)           # stage-1 commit
        ntt += commit_cols(c.stage2_width)         # stage-2 commit
        ntt += D * (m // 2) * (m.bit_length() - 1)  # quotient coset iDFT at m
        ntt += q * D * (N // 2) * log_N            # quotient LDE (no iDFT)
        lde_heights.extend([N] * 3)                # 3 trees see this height
        hashes += 3 * N + N * (c.main_width + c.stage2_width + q * D) // 8
    if lde_heights:
        N_max = max(lde_heights)
        # FRI fold tail: reduced opening at N_max, pair folds halving to the
        # final size (log_blowup + log_final_poly_len), one tree per round
        fri = system.config.fri_parameters
        size = N_max
        final = 1 << (b + fri.log_final_poly_len)
        while size > final:
            ntt += (size // 2) * D
            hashes += size
            size //= 2
    return ntt, hashes


def _warm_transfer_path():
    """The axon client pays a one-time ~350 s init on a process's FIRST
    device->host value fetch (r4 probes; re-measured ~340-990 s this round
    under load).  Kick it off on a daemon thread at case start so it
    overlaps the multi-minute compile phase instead of serializing after
    it."""
    import threading

    def fetch():
        try:
            import jax
            import jax.numpy as jnp

            jax.device_get(jnp.zeros(8, jnp.uint32))
            log("[warm] transfer-path init done")
        except Exception as e:  # best-effort
            log(f"[warm] transfer-path init failed: {e}")

    t = threading.Thread(target=fetch, daemon=True)
    t.start()
    return t


def run_case(label: str, config, system, key, traces, claims, iters: int):
    import jax

    from multistark_tpu.profiling import reset_spans, span_memory, span_times
    from multistark_tpu.prover import prove_multiple_claims
    from multistark_tpu.system import SystemWitness
    from multistark_tpu.verifier import verify_multiple_claims

    _warm_transfer_path()
    t0 = time.time()
    witness = SystemWitness.from_stage_1(traces, system, key)
    jax.block_until_ready(witness.traces[0])
    log(f"[{label}] witness build: {time.time() - t0:.2f}s")

    # warmup (compiles everything; criterion likewise excludes Rust codegen).
    # Track its per-span memory separately: the process's RSS plateau is
    # reached HERE (compile + first execution), not in the warm proves.
    reset_spans()
    t0 = time.time()
    proof = prove_multiple_claims(system, key, witness, claims)
    log(f"[{label}] prove warmup (incl. compile): {time.time() - t0:.2f}s")
    warm_mem = {
        k.split("/", 1)[-1]: {kk: round(vv, 1) for kk, vv in m.items()}
        for k, m in sorted(span_memory().items())
    }
    log(f"[{label}] warmup span memory (MiB): " + json.dumps(warm_mem))

    times = []
    spans = {}
    for i in range(iters):
        reset_spans()
        t0 = time.time()
        proof = prove_multiple_claims(system, key, witness, claims)
        dt = time.time() - t0
        times.append(dt)
        spans = {k.split("/", 1)[-1]: round(v, 3) for k, v in sorted(span_times().items())}
        log(f"[{label}] prove[{i}]: {dt:.3f}s  spans: "
            + " ".join(f"{k.split('/')[-1]}={v:.2f}" for k, v in spans.items()))

    ntt_ops, hash_ops = analytic_ops(system, [t.shape[0] for t in traces])
    mem = {
        k.split("/", 1)[-1]: {kk: round(vv, 1) for kk, vv in m.items()}
        for k, m in sorted(span_memory().items())
    }
    result = {
        "prove_best_s": round(min(times), 4),
        "prove_median_s": round(sorted(times)[len(times) // 2], 4),
        "proof_bytes": len(proof.to_bytes(config)),
        "peak_rss_mib": round(peak_rss_mib(), 1),
        "ntt_merkle_gops_s": round((ntt_ops + hash_ops) / min(times) / 1e9, 3),
        "ntt_butterflies": ntt_ops,
        "merkle_hashes": hash_ops,
        "spans": spans,
        "span_memory_mib": mem,
        "warmup_span_memory_mib": warm_mem,
    }
    if os.environ.get("BENCH_VERIFY", "1") != "0":
        t0 = time.time()
        verify_multiple_claims(system, claims, proof)
        result["verify_s"] = round(time.time() - t0, 4)
        log(f"[{label}] verify: {result['verify_s']:.3f}s")
    return result


def _run_size_subprocess(log_n: int, iters: int) -> dict:
    """One size in a child `python bench.py` under a hard timeout (default
    100 min — a cold 2^20 compile through the tunnel needs most of that).
    Returns the child's per-size result dict.

    A RESOURCE_EXHAUSTED failure retries ONCE with the split memory plan
    (MULTISTARK_STAGE_FUSE_LOG/NTT_SPLIT_LOG=21): per-stage NTT programs
    and per-level tree commits have a much smaller peak live set than the
    fused whole-stage program, at some dispatch cost."""
    import subprocess

    timeout_s = int(os.environ.get("BENCH_SIZE_TIMEOUT", "6000"))

    def attempt(extra_env):
        env = dict(os.environ)
        env.update(
            BENCH_SIZES=str(log_n), BENCH_SUBPROC="0", BENCH_ITERS=str(iters)
        )
        env.update(extra_env)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, timeout=timeout_s, capture_output=True, text=True,
        )
        for line in out.stderr.splitlines():
            log(line)
        return out

    split_env = {
        "MULTISTARK_STAGE_FUSE_LOG": "21", "MULTISTARK_NTT_SPLIT_LOG": "21",
    }
    # 2^20 on one chip RESOURCE_EXHAUSTs under the fused plan (r5 capture:
    # DT flush OOM, then host fallback OOM) — start those sizes on the
    # split plan directly instead of burning a cold compile to rediscover it.
    split_first = log_n >= int(os.environ.get("BENCH_SPLIT_FIRST_LOG", "20"))
    out = attempt(split_env if split_first else {})
    if split_first and out.returncode == 0:
        payload = json.loads(out.stdout.strip().splitlines()[-1])
        res = payload["sizes"][f"2^{log_n}"]
        res["memory_plan"] = "split"
        return res
    if out.returncode != 0 and "RESOURCE_EXHAUSTED" in (out.stderr + out.stdout):
        plan, env2 = (
            ("fused", {}) if split_first else ("split", split_env)
        )
        log(f"[2^{log_n}] RESOURCE_EXHAUSTED; retrying on the {plan} plan")
        out = attempt(env2)
        if out.returncode == 0:
            payload = json.loads(out.stdout.strip().splitlines()[-1])
            res = payload["sizes"][f"2^{log_n}"]
            res["memory_plan"] = plan
            return res
    if out.returncode != 0:
        raise RuntimeError(f"size subprocess rc={out.returncode}: {out.stderr[-500:]}")
    payload = json.loads(out.stdout.strip().splitlines()[-1])
    return payload["sizes"][f"2^{log_n}"]


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/multistark_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    workload = os.environ.get("BENCH_WORKLOAD", "u32_add")
    iters = int(os.environ.get("BENCH_ITERS", "3"))
    backend = jax.default_backend()

    if workload == "blake3":
        msg_kib = int(os.environ.get("BENCH_MSG_KIB", "4"))
        log(f"bench: blake3 hasher family ({msg_kib} KiB) on {backend}")
        sizes = {f"{msg_kib}KiB": run_case(
            f"blake3/{msg_kib}KiB", *blake3_case(msg_kib), iters
        )}
        headline_key = f"{msg_kib}KiB"
        metric = f"blake3_hasher_{msg_kib}KiB_prove_wall"
    else:
        # default sweep: on TPU 2^14 (reference bench size) + 2^18 + the
        # 2^20 north star (BASELINE.json); smallest first so a harness
        # timeout still leaves complete captures on stdout.  The CPU
        # fallback stays at 2^14 so a tunnel outage yields a bounded,
        # clearly-labelled capture
        default_sizes = os.environ.get(
            "BENCH_LOG_N", "14,18,20" if backend == "tpu" else "14"
        )
        size_list = [
            int(s) for s in os.environ.get("BENCH_SIZES", default_sizes).split(",")
        ]
        log(f"bench: u32_add+byte_table at {['2^%d' % s for s in size_list]} rows on {backend}")
        sizes = {}
        ok_sizes = []
        subproc = (
            os.environ.get("BENCH_SUBPROC", "1" if len(size_list) > 1 else "0")
            != "0"
        )
        for log_n in size_list:
            try:
                if subproc:
                    # each size in its own watchdogged subprocess: a tunnel
                    # wedge mid-compile blocks the client FOREVER (observed
                    # at 2^20 after a remote EOF), and only a process-level
                    # timeout can cut that loss while the other sizes still
                    # land.  Compiled programs share the persistent cache.
                    sizes[f"2^{log_n}"] = _run_size_subprocess(log_n, iters)
                else:
                    sizes[f"2^{log_n}"] = run_case(
                        f"u32_add/2^{log_n}", *u32_add_case(log_n), iters
                    )
                ok_sizes.append(log_n)
            except Exception as e:  # the axon remote-compile tunnel drops
                # long compiles intermittently (Unexpected EOF observed at
                # 2^18); record the failure but land every size that ran
                log(f"[u32_add/2^{log_n}] FAILED: {type(e).__name__}: {e}")
                sizes[f"2^{log_n}"] = {"error": f"{type(e).__name__}: {str(e)[:300]}"}
            if ok_sizes:
                # emit the result line NOW, after every completed size, so a
                # harness timeout mid-sweep (a cold 2^18 compile is ~tens of
                # minutes through the tunnel; BENCH_r03 was killed there with
                # no JSON captured) still leaves the latest complete capture
                # on stdout — consumers take the last line
                headline = max(ok_sizes)
                _emit(f"u32_add_prove_2^{headline}_wall", f"2^{headline}",
                      backend, sizes)
        if not ok_sizes:
            raise SystemExit(f"all bench sizes failed: {sizes}")
        return
    _emit(metric, headline_key, backend, sizes)


def _emit(metric: str, headline_key: str, backend: str, sizes: dict):
    # CONTRACT: one JSON line is printed after EVERY completed size of a
    # multi-size sweep, so a consumer must take the LAST stdout line (the
    # in-repo subprocess reader does); earlier lines are partial captures
    # kept so a harness timeout mid-sweep still leaves data on stdout.
    print(
        json.dumps(
            {
                "metric": metric,
                "value": sizes[headline_key]["prove_best_s"],
                "unit": "s",
                "vs_baseline": None,
                "backend": backend,
                **(
                    {"note": "TPU tunnel was unreachable; CPU fallback — NOT comparable to TPU captures"}
                    if globals().get("_TUNNEL_FALLBACK")
                    else {}
                ),
                "sizes": sizes,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
