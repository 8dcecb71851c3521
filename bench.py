"""Round benchmark: prints ONE JSON line.

Primary metric: p50 top-20 query latency over 1M 1152-d vectors on one chip
(north star: <10 ms, BASELINE.json). vs_baseline = 10ms / p50 (multiples of
the target; >1.0 beats it). Extra fields report indexing throughput
(SigLIP2 SO400M image-tower forward, images/sec/chip; north star
>=10k images/min/chip ≈ 167 img/s) and environment info.

Measurement notes: the dev harness reaches the TPU through a remote tunnel
whose per-call RPC overhead (tens of ms) would swamp a single-digit-ms
kernel, so latency is measured by chaining Q sequential searches in one
compiled program (lax.scan forces serialization) and dividing; that is the
steady-state per-query device latency a resident server would see.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _tpu_jax():
    import jax

    return jax


def bench_query_latency(
    jax,
    n=int(os.environ.get("TPUCLIP_BENCH_N", 1_000_000)),
    d=1152,
    k=20,
    chain=int(os.environ.get("TPUCLIP_BENCH_CHAIN", 32)),
):
    import jax.numpy as jnp

    from tpuclip.ops.topk import pad_matrix_t, topk_pallas, topk_xla

    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    # feature-major (D, N) layout, pre-padded to the kernel tile — see
    # tpuclip.ops.topk (padding per-call would copy the matrix every query)
    host = rng.standard_normal((d, n)).astype(np.float32)
    padded, n_valid_int = pad_matrix_t(host)
    matrix = jnp.asarray(padded, dtype=dtype)
    n_valid = jnp.asarray(n_valid_int, jnp.int32)
    queries = jnp.asarray(rng.standard_normal((chain, 1, d)).astype(np.float32), dtype=dtype)
    matrix.block_until_ready()

    use_pallas = jax.default_backend() == "tpu"

    def single(q, m, k):
        if use_pallas:
            return topk_pallas(q, m, k, n_valid=n_valid)
        return topk_xla(q, m, k)

    import jax as _jax

    @_jax.jit
    def chained(queries, matrix):
        def step(carry, q):
            # fold the previous result into the query to force sequential
            # execution (prevents XLA from batching the scan body)
            q = q + carry * 0.0
            s, i = single(q, matrix, k)
            return jnp.max(s), (s, i)

        _, outs = _jax.lax.scan(step, jnp.zeros((), jnp.float32), queries)
        return outs

    # warm up / compile
    out = chained(queries, matrix)
    _jax.block_until_ready(out)
    _ = np.asarray(out[0][0])

    samples = []
    for _i in range(5):
        t0 = time.perf_counter()
        out = chained(queries, matrix)
        _ = np.asarray(out[0])  # host fetch forces full completion
        samples.append((time.perf_counter() - t0) / chain)
    per_query_ms = float(np.percentile(np.array(samples), 50) * 1000)
    return per_query_ms, "pallas" if use_pallas else "xla"


def bench_query_latency_int8(jax, n, d=1152, k=20, chain=32):
    """int8 quantized search mode (TPUCLIP_SEARCH_PRECISION=int8)."""
    import jax.numpy as jnp

    from tpuclip.ops.topk import pad_matrix_t
    from tpuclip.ops.topk_int8 import (
        INT8_TILE_N,
        quantize_matrix_t,
        quantize_query,
        topk_int8_pallas,
        topk_int8_xla,
    )

    rng = np.random.default_rng(0)
    host = rng.standard_normal((d, n)).astype(np.float32)
    padded, n_valid_int = pad_matrix_t(host, tile_n=INT8_TILE_N)
    mq_host, scales_host = quantize_matrix_t(padded)
    matrix = jnp.asarray(mq_host)
    scales = jnp.asarray(scales_host)
    n_valid = jnp.asarray(n_valid_int, jnp.int32)
    use_pallas = jax.default_backend() == "tpu"

    qs_host = rng.standard_normal((chain, 1, d)).astype(np.float32)
    q_list = [quantize_query(qs_host[i]) for i in range(chain)]
    qi = jnp.asarray(np.stack([a for a, _ in q_list]))
    qsc = jnp.asarray(np.array([b for _, b in q_list], np.float32))
    matrix.block_until_ready()

    import jax as _jax

    @_jax.jit
    def chained(qi, qsc, matrix, scales):
        def step(carry, inp):
            q, s = inp
            q = q + (carry * 0.0).astype(q.dtype)
            if use_pallas:
                sc, ix = topk_int8_pallas(q, matrix, scales, s, k, n_valid=n_valid)
            else:
                sc, ix = topk_int8_xla(q, matrix, scales, s, k, n_valid=n_valid)
            return jnp.max(sc).astype(jnp.int32), (sc, ix)

        _, outs = _jax.lax.scan(step, jnp.zeros((), jnp.int32), (qi, qsc))
        return outs

    out = chained(qi, qsc, matrix, scales)
    _ = np.asarray(out[0])
    samples = []
    for _i in range(5):
        t0 = time.perf_counter()
        out = chained(qi, qsc, matrix, scales)
        _ = np.asarray(out[0])
        samples.append((time.perf_counter() - t0) / chain)
    return float(np.percentile(np.array(samples), 50) * 1000)


_FUSED_PREP = {}


def _fused_prep(jax, n, d):
    """Build (once per (n, d)) the device-resident int8 matrix + scales +
    full-precision rows shared by the fused-rerank benchmarks — the host-side
    prep is minutes of numpy on a small host, don't repeat it."""
    key = (n, d)
    if key in _FUSED_PREP:
        return _FUSED_PREP[key]
    import jax.numpy as jnp

    from tpuclip.ops.topk import pad_matrix_t
    from tpuclip.ops.topk_int8 import INT8_TILE_N, quantize_matrix_t

    rng = np.random.default_rng(0)
    host = rng.standard_normal((d, n)).astype(np.float32)
    padded, n_valid_int = pad_matrix_t(host, tile_n=INT8_TILE_N)
    mq_host, scales_host = quantize_matrix_t(padded)
    matrix = jnp.asarray(mq_host)
    scales = jnp.asarray(scales_host)
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    rows = jnp.asarray(np.ascontiguousarray(host.T), dtype=dtype)
    n_valid = jnp.asarray(n_valid_int, jnp.int32)
    jax.block_until_ready((matrix, rows))
    _FUSED_PREP[key] = (matrix, scales, rows, n_valid)
    return _FUSED_PREP[key]


def _fused_chained_p50(jax, n, d, k, queries, divisor):
    """Shared chained-scan p50 protocol for the fused-rerank benchmarks:
    jit a lax.scan over ``queries`` (carry-coupled to force sequential
    execution), warm up, then median of 5 samples divided by ``divisor``."""
    import jax.numpy as jnp

    from tpuclip.ops.topk_int8 import topk_int8_rerank_fused

    matrix, scales, rows, n_valid = _fused_prep(jax, n, d)
    use_pallas = jax.default_backend() == "tpu"

    @jax.jit
    def chained(queries, matrix, scales, rows):
        def step(carry, q):
            q = q + carry * 0.0
            s, i = topk_int8_rerank_fused(
                q, matrix, scales, rows, k, n_valid=n_valid, use_pallas=use_pallas
            )
            return jnp.max(s), (s, i)

        _, outs = jax.lax.scan(step, jnp.zeros((), jnp.float32), queries)
        return outs

    out = chained(queries, matrix, scales, rows)
    _ = np.asarray(out[0])
    samples = []
    for _i in range(5):
        t0 = time.perf_counter()
        out = chained(queries, matrix, scales, rows)
        _ = np.asarray(out[0])
        samples.append((time.perf_counter() - t0) / divisor)
    return float(np.percentile(np.array(samples), 50) * 1000)


def bench_query_latency_int8_fused(jax, n, d=1152, k=20, chain=32):
    """Fused int8 scan + on-device exact rescore (the production int8
    serving path: TPUCLIP_SEARCH_PRECISION=int8 with device rerank). One
    device program returns exact full-precision scores — no host re-rank."""
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    queries = jnp.asarray(rng.standard_normal((chain, 1, d)).astype(np.float32))
    return _fused_chained_p50(jax, n, d, k, queries, chain)


def bench_batch_throughput(jax, n, d=1152, k=20, q_batch=16, iters=8):
    """Serving throughput: queries/sec when concurrent queries share one
    scan (the serve micro-batcher's code path — one int8 fused program per
    request group, matrix read once per batch)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    queries = jnp.asarray(
        rng.standard_normal((iters, q_batch, d)).astype(np.float32)
    )
    batch_ms = _fused_chained_p50(jax, n, d, k, queries, iters)
    return batch_ms, q_batch / (batch_ms / 1000.0)


def bench_ivf(jax, n, d=1152, k=20, chain=32):
    """IVF bucketed approximate search (TPUCLIP_SEARCH_MODE=ivf): p50 over
    CLUSTERED synthetic data (1024 modes — IVF's recall/speed depend on
    cluster structure; uniform-random data is the degenerate worst case)
    plus measured top-k recall vs the exact scan on the same data."""
    import jax.numpy as jnp

    from tpuclip.index.ivf import build_ivf, ivf_topk_rerank

    rng = np.random.default_rng(0)
    modes = 1024
    centers = rng.standard_normal((modes, d), dtype=np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    which = rng.integers(0, modes, n)
    x = centers[which] + 0.05 * rng.standard_normal((n, d), dtype=np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)

    index = build_ivf(x, nprobe=32)
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    rows_dev = jnp.asarray(x, dtype=dtype)

    qw = rng.integers(0, modes, chain)
    q = centers[qw] + 0.05 * rng.standard_normal((chain, d), dtype=np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    queries = jnp.asarray(q[:, None, :])
    jax.block_until_ready((index.buckets, rows_dev))

    @jax.jit
    def chained(queries):
        def step(carry, qq):
            qq = qq + carry * 0.0
            s, i = ivf_topk_rerank(
                qq, index.centroids, index.buckets, index.bucket_scales,
                index.bucket_rows, index.over_t, index.over_scales,
                index.over_rows, rows_dev, k, index.nprobe,
            )
            return jnp.max(s), (s, i)

        _, outs = jax.lax.scan(step, jnp.zeros((), jnp.float32), queries)
        return outs

    out = chained(queries)
    _ = np.asarray(out[0])
    samples = []
    for _i in range(5):
        t0 = time.perf_counter()
        out = chained(queries)
        _ = np.asarray(out[0])
        samples.append((time.perf_counter() - t0) / chain)
    p50 = float(np.percentile(np.array(samples), 50) * 1000)

    # recall vs the exact scan over the same resident rows
    got = np.asarray(out[1][1]).reshape(chain, k)

    @jax.jit
    def exact_topk(queries):
        scores = jnp.einsum(
            "qd,nd->qn", queries.astype(rows_dev.dtype), rows_dev,
            preferred_element_type=jnp.float32,
        )
        return jax.lax.top_k(scores, k)

    _, true_i = exact_topk(jnp.asarray(q))
    true_i = np.asarray(true_i)
    recall = float(
        np.mean([
            len(set(got[c].tolist()) & set(true_i[c].tolist())) / k
            for c in range(chain)
        ])
    )
    return p50, recall


def bench_text_query_fused(jax, n, d=1152, k=20, iters=24):
    """End-to-end text query as ONE device program: token ids → SO400M text
    tower → int8 scan → exact rescore → top-k. This is the resident
    server's whole per-query device cost (the reference runs tokenizer,
    torch forward, and a sqlite-vec scan as separate host-coupled stages).

    Measured by dispatching ``iters`` distinct-input calls back-to-back and
    fetching only the last result (device executes a single in-order queue,
    so the final fetch bounds all of them): wall / iters ≈ per-query device
    time + amortized dispatch. The chained-scan protocol used elsewhere is
    NOT used here — wrapping this module in lax.scan/fori_loop reliably
    wedges the dev tunnel's remote-compile helper (the single program
    compiles in ~10 s), and per-call block_until_ready resolves early
    through the tunnel (measured 0.4 ms "latency" for a 2.7 ms scan), so
    only a host data fetch is a trustworthy completion barrier."""
    import jax.numpy as jnp

    from tpuclip.models.configs import get_config
    from tpuclip.models.siglip import init_params
    from tpuclip.ops.topk_int8 import text_topk_fused

    cfg = get_config("google/siglip2-so400m-patch14-224")
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    params = jax.device_put(init_params(jax.random.PRNGKey(0), cfg, dtype=dtype))
    matrix, scales, rows, n_valid = _fused_prep(jax, n, d)
    use_pallas = jax.default_backend() == "tpu"

    rng = np.random.default_rng(3)
    all_ids = jnp.asarray(
        rng.integers(0, cfg.text.vocab_size, size=(iters, 1, 64), dtype=np.int32)
    )
    mask = jnp.ones((1, 64), jnp.int32)

    def call(i):
        return text_topk_fused(
            params, all_ids[i], mask, matrix, scales, rows, cfg, k,
            n_valid=n_valid, compute_dtype=dtype, use_pallas=use_pallas,
        )

    _ = np.asarray(call(0)[0])  # compile + warm (host fetch = completion)
    samples = []
    for _rep in range(3):
        t0 = time.perf_counter()
        last = None
        for i in range(1, iters):
            last = call(i)
        _ = np.asarray(last[0])  # single queue: last done => all done
        samples.append((time.perf_counter() - t0) / (iters - 1))
    return float(np.percentile(np.array(samples), 50) * 1000)


def bench_binary_latency(jax, n, d=1152, k=20, chain=32):
    """Packed-binary scan p50 (the reference's binary-only DB mode)."""
    import jax.numpy as jnp

    from tpuclip.ops.hamming import (
        binary_topk_packed,
        binary_topk_packed_pallas,
        pack_bits_to_words,
        pad_words_t,
    )

    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, (n, d), dtype=np.uint8)
    words = pack_bits_to_words(bits)
    use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        wt, nv_int = pad_words_t(words)
        matrix = jnp.asarray(wt)
        nv = jnp.asarray(nv_int, jnp.int32)
    else:
        matrix = jnp.asarray(words)
    qwords = jnp.asarray(
        pack_bits_to_words(rng.integers(0, 2, (chain, d), dtype=np.uint8))
    ).reshape(chain, 1, -1)
    matrix.block_until_ready()

    import jax as _jax

    @_jax.jit
    def chained(qwords, matrix):
        def step(carry, q):
            q = jnp.bitwise_xor(q, jnp.zeros_like(q) & carry)
            if use_pallas:
                s, i = binary_topk_packed_pallas(q, matrix, k, n_valid=nv)
            else:
                s, i = binary_topk_packed(q, matrix, k)
            return jnp.max(s).astype(jnp.uint32), (s, i)

        _, outs = _jax.lax.scan(step, jnp.zeros((), jnp.uint32), qwords)
        return outs

    out = chained(qwords, matrix)
    _ = np.asarray(out[0])
    samples = []
    for _i in range(5):
        t0 = time.perf_counter()
        out = chained(qwords, matrix)
        _ = np.asarray(out[0])
        samples.append((time.perf_counter() - t0) / chain)
    return float(np.percentile(np.array(samples), 50) * 1000)


def bench_indexing_throughput(jax, batch=16, iters=16):
    # batch 16 measured fastest on v5e (sweep 16→256: 659/574/572/488/477
    # img/s) — small batches keep activations in VMEM; this also matches the
    # reference's default inference batch (image_database.py:1904).
    """SO400M image-tower forward throughput (device-side ceiling for scan)."""
    import jax.numpy as jnp

    from tpuclip.models.configs import get_config
    from tpuclip.models.siglip import init_params, vision_forward

    cfg = get_config("google/siglip2-so400m-patch14-224")
    dtype = jnp.bfloat16
    params = init_params(jax.random.PRNGKey(0), cfg, dtype=dtype)
    params = jax.device_put(params)

    @jax.jit
    def embed_many(params, pixels):
        def step(carry, px):
            out = vision_forward(params["vision"], px, cfg.vision, compute_dtype=dtype)
            return carry + jnp.sum(out).astype(jnp.float32), None

        total, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), pixels)
        return total

    rng = np.random.default_rng(0)
    pixels = jnp.asarray(
        rng.integers(0, 256, size=(iters, batch, 224, 224, 3), dtype=np.uint8)
    )
    _ = np.asarray(embed_many(params, pixels))  # compile + warm
    t0 = time.perf_counter()
    _ = np.asarray(embed_many(params, pixels))
    dt = time.perf_counter() - t0
    return batch * iters / dt


def make_jpeg_tree(root, n_images, width=1024, height=768, uniques=64):
    """Synthetic photo library: n_images JPEGs at width x height.

    Encoding thousands of multi-MP JPEGs would dominate bench time on a
    1-core host, so we encode ``uniques`` distinct images and replicate the
    rest as byte copies with a unique trailer (PIL decodes past EOI fine;
    sha256 and decode cost stay real per file)."""
    import shutil

    from PIL import Image

    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(7)
    unique_paths = []
    for u in range(min(uniques, n_images)):
        # Photo-like content: smooth low-frequency structure + mild sensor
        # noise compresses to ~200 KB at q85 like a real photo. (Raw noise
        # JPEGs are ~580 KB and entropy-decode-bound — an unrepresentative
        # 3x decode penalty.)
        low = rng.integers(0, 256, size=(height // 8, width // 8, 3), dtype=np.uint8)
        arr = np.asarray(Image.fromarray(low).resize((width, height), Image.BILINEAR))
        arr = (arr.astype(np.int16) + rng.integers(-10, 10, size=arr.shape)).clip(0, 255).astype(np.uint8)
        sub = os.path.join(root, f"folder_{u % 8}")
        os.makedirs(sub, exist_ok=True)
        p = os.path.join(sub, f"img_{u:05d}.jpg")
        Image.fromarray(arr).save(p, "JPEG", quality=85)
        unique_paths.append(p)
    for i in range(len(unique_paths), n_images):
        src = unique_paths[i % len(unique_paths)]
        dst = os.path.join(os.path.dirname(src), f"img_{i:05d}.jpg")
        shutil.copyfile(src, dst)
        with open(dst, "ab") as f:
            f.write(b"\x00tpuclip-bench-%d" % i)
    return root


def bench_end_to_end_scan(jax):
    """Full scan pipeline (census -> decode -> hash -> embed -> commit) on a
    synthetic 1024x768 JPEG tree — the honest images/min *indexed*, not the
    device ceiling. Matches the reference's real bottleneck: host decode
    inside the embed loop (image_database.py:471-479)."""
    import shutil
    import tempfile

    n = int(os.environ.get("TPUCLIP_BENCH_E2E_N", 2000))
    tmp = tempfile.mkdtemp(prefix="tpuclip_bench_e2e_")
    os.environ.setdefault("TPUCLIP_INIT", "random")
    os.environ["TPUCLIP_QUIET"] = "1"
    os.environ["TPUCLIP_FAST_DECODE"] = "1"  # labeled: draft-mode decode
    os.environ["TPUCLIP_HOME"] = os.path.join(tmp, "home")
    batch = int(os.environ.get("TPUCLIP_BENCH_E2E_BATCH", 32))
    try:
        from tpuclip.engine import ImageDatabase

        warm_dir = make_jpeg_tree(os.path.join(tmp, "warm"), 2 * batch + 16)
        main_dir = make_jpeg_tree(os.path.join(tmp, "imgs"), n)

        # Decode-only rate on the same files: quantifies how host-bound the
        # e2e number is (this dev host has ONE core; prod hosts have many).
        from tpuclip.io.prefetch import prefetch_batches

        files = []
        for dp, _, fns in os.walk(main_dir):
            files.extend((os.path.join(dp, f), 0.0) for f in sorted(fns))
        files = files[: min(600, n)]
        t0 = time.perf_counter()
        count = sum(len(b.items) for b in prefetch_batches(iter(files), batch, 224))
        decode_rate = count / (time.perf_counter() - t0)

        engine = ImageDatabase(
            db_path=os.path.join(tmp, "bench.db"), inference_batch_size=batch
        )
        # Warm-up scan compiles the embed program and opens the DB paths.
        engine.scan_directory(warm_dir, batch_size=75)
        t0 = time.perf_counter()
        engine.scan_directory(main_dir, batch_size=75)
        dt = time.perf_counter() - t0
        conn = __import__("sqlite3").connect(os.path.join(tmp, "bench.db"))
        rows = conn.execute(
            "SELECT COUNT(*) FROM images WHERE file_path LIKE ?", (main_dir + "%",)
        ).fetchone()[0]
        conn.close()
        if rows < n * 0.98:
            raise RuntimeError(f"scan indexed only {rows}/{n} images")
        return n / dt, decode_rate
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main():
    result = {
        "metric": "p50 top-20 query latency over 1M x 1152 vectors (1 chip)",
        "value": None,
        "unit": "ms",
        "vs_baseline": None,
    }
    try:
        jax = _tpu_jax()
        try:
            from tpuclip.utils.compile_cache import enable_compilation_cache

            enable_compilation_cache()
        except Exception:  # noqa: BLE001
            pass
        backend = jax.default_backend()
        # the dev TPU tunnel is intermittently slow to come up — retry once
        last_err = None
        for attempt in range(2):
            try:
                per_query_ms, impl = bench_query_latency(jax)
                break
            except Exception as e:  # noqa: BLE001
                last_err = e
                time.sleep(15)
        else:
            raise last_err  # type: ignore[misc]
        result["n_vectors"] = int(os.environ.get("TPUCLIP_BENCH_N", 1_000_000))
        result["value"] = round(per_query_ms, 3)
        result["vs_baseline"] = round(10.0 / per_query_ms, 2)  # >1.0 beats the 10ms target
        result["backend"] = backend
        result["kernel"] = impl
        try:
            n = int(os.environ.get("TPUCLIP_BENCH_N", 1_000_000))
            chain = int(os.environ.get("TPUCLIP_BENCH_CHAIN", 32))
            result["int8_p50_ms"] = round(
                bench_query_latency_int8(jax, n, chain=chain), 3
            )
        except Exception as e:  # noqa: BLE001
            result["int8_error"] = str(e)[:200]
        try:
            n = int(os.environ.get("TPUCLIP_BENCH_N", 1_000_000))
            chain = int(os.environ.get("TPUCLIP_BENCH_CHAIN", 32))
            result["int8_fused_rerank_p50_ms"] = round(
                bench_query_latency_int8_fused(jax, n, chain=chain), 3
            )
        except Exception as e:  # noqa: BLE001
            result["int8_fused_error"] = str(e)[:200]
        try:
            n = int(os.environ.get("TPUCLIP_BENCH_N", 1_000_000))
            batch_ms, qps = bench_batch_throughput(jax, n)
            result["int8_fused_batch16_ms"] = round(batch_ms, 3)
            result["int8_fused_batch16_qps"] = round(qps)
        except Exception as e:  # noqa: BLE001
            result["batch_error"] = str(e)[:200]
        try:
            if os.environ.get("TPUCLIP_BENCH_SKIP_TEXT_FUSED") == "1":
                raise RuntimeError("skipped by env")
            n = int(os.environ.get("TPUCLIP_BENCH_N", 1_000_000))
            result["text_query_fused_ms"] = round(
                bench_text_query_fused(jax, n), 3
            )
        except Exception as e:  # noqa: BLE001
            result["text_fused_error"] = str(e)[:200]
        try:
            if os.environ.get("TPUCLIP_BENCH_SKIP_IVF") == "1":
                raise RuntimeError("skipped by env")
            n = int(os.environ.get("TPUCLIP_BENCH_N", 1_000_000))
            chain = int(os.environ.get("TPUCLIP_BENCH_CHAIN", 32))
            ivf_ms, ivf_recall = bench_ivf(jax, n, chain=chain)
            result["ivf_p50_ms"] = round(ivf_ms, 3)
            result["ivf_recall_top20"] = round(ivf_recall, 4)
        except Exception as e:  # noqa: BLE001
            result["ivf_error"] = str(e)[:200]
        try:
            n = int(os.environ.get("TPUCLIP_BENCH_N", 1_000_000))
            chain = int(os.environ.get("TPUCLIP_BENCH_CHAIN", 32))
            result["binary_p50_ms"] = round(bench_binary_latency(jax, n, chain=chain), 3)
        except Exception as e:  # noqa: BLE001
            result["binary_error"] = str(e)[:200]
        try:
            if os.environ.get("TPUCLIP_BENCH_SKIP_INDEXING") == "1":
                raise RuntimeError("skipped by env")
            imgs_per_sec = bench_indexing_throughput(jax)
            result["indexing_images_per_sec"] = round(imgs_per_sec, 1)
            result["indexing_images_per_min"] = round(imgs_per_sec * 60)
        except Exception as e:  # noqa: BLE001
            result["indexing_error"] = str(e)[:200]
        try:
            if os.environ.get("TPUCLIP_BENCH_SKIP_E2E") == "1":
                raise RuntimeError("skipped by env")
            e2e_per_sec, decode_rate = bench_end_to_end_scan(jax)
            result["end_to_end_images_per_sec"] = round(e2e_per_sec, 1)
            result["end_to_end_images_per_min"] = round(e2e_per_sec * 60)
            result["end_to_end_workload"] = "1024x768 JPEG tree, fast-decode, full scan pipeline"
            result["host_decode_images_per_sec"] = round(decode_rate, 1)
            if result.get("indexing_images_per_sec"):
                # Fraction of the device embed ceiling the host pipeline
                # sustains — quantifies how decode/transfer-bound this
                # 1-core, tunneled dev host is.
                result["e2e_device_ceiling_fraction"] = round(
                    e2e_per_sec / result["indexing_images_per_sec"], 3
                )
        except Exception as e:  # noqa: BLE001
            result["e2e_error"] = str(e)[:200]
    except Exception as e:  # noqa: BLE001
        result["error"] = str(e)[:300]
    print(json.dumps(result))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
