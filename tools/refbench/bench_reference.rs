//! Single-node, single-thread kernel throughput of the REFERENCE crate.
//!
//! BASELINE.md documents that the reference publishes no benchmarks;
//! this binary closes that gap by measuring the reference itself on
//! deterministic update streams, so the engine's "matches-or-beats the
//! reference's single-node throughput" claim is checked against a
//! number the reference actually produced on this host, not a proxy.
//! The Python twin (`bench_engine.py`) runs the engine's deployed
//! vectorized kernels over the SAME streams; `run_refbench.py`
//! interleaves the two so host phases hit both sides equally.
//!
//! Build exactly like the fixture generator (tools/fixturegen/README):
//! copy /root/reference/datasketches, strip dev-deps, drop this file
//! into src/bin/, `cargo run --release --bin bench_reference`.
//!
//! Output: one JSON object on stdout,
//! {"family": {"n": N, "sec": s, "ops_per_sec": r, "check": v}, ...}
//! where `check` is an estimate/count consumed from the built sketch
//! so the update loops cannot be optimized away.

use std::hint::black_box;
use std::time::Instant;

use datasketches::bloom::BloomFilterBuilder;
use datasketches::countmin::CountMinSketch;
use datasketches::cpc::CpcSketch;
use datasketches::frequencies::FrequentItemsSketch;
use datasketches::hll::{HllSketch, HllType};
use datasketches::tdigest::TDigestMut;
use datasketches::theta::ThetaSketch;

fn rec(out: &mut Vec<String>, name: &str, n: u64, sec: f64, check: f64) {
    out.push(format!(
        "\"{}\": {{\"n\": {}, \"sec\": {:.4}, \"ops_per_sec\": {:.0}, \"check\": {:.4}}}",
        name,
        n,
        sec,
        n as f64 / sec,
        check
    ));
}

fn main() {
    let mut out: Vec<String> = Vec::new();

    // theta update, lg_k=12 (the signature core)
    {
        const N: u64 = 4_000_000;
        let mut sk = ThetaSketch::builder().lg_k(12).build();
        let t0 = Instant::now();
        for i in 0..N {
            sk.update(black_box(i));
        }
        let dt = t0.elapsed().as_secs_f64();
        rec(&mut out, "theta_update", N, dt, sk.estimate());
    }

    // theta serialize+deserialize round-trip (v3 wire)
    {
        const N: u64 = 2_000;
        let mut sk = ThetaSketch::builder().lg_k(12).build();
        for i in 0..100_000u64 {
            sk.update(i);
        }
        let compact = sk.compact(true);
        let t0 = Instant::now();
        let mut bytes_total = 0u64;
        for _ in 0..N {
            let blob = compact.serialize();
            bytes_total += blob.len() as u64;
            black_box(&blob);
        }
        let dt = t0.elapsed().as_secs_f64();
        rec(&mut out, "theta_serialize", N, dt, bytes_total as f64);
    }

    // hll update, lg_k=12, HLL8 (the engine's dense layout)
    {
        const N: u64 = 4_000_000;
        let mut sk = HllSketch::new(12, HllType::Hll8);
        let t0 = Instant::now();
        for i in 0..N {
            sk.update(black_box(i));
        }
        let dt = t0.elapsed().as_secs_f64();
        rec(&mut out, "hll_update", N, dt, sk.estimate());
    }

    // cpc update, lg_k=11
    {
        const N: u64 = 2_000_000;
        let mut sk = CpcSketch::new(11);
        let t0 = Instant::now();
        for i in 0..N {
            sk.update(black_box(i));
        }
        let dt = t0.elapsed().as_secs_f64();
        rec(&mut out, "cpc_update", N, dt, sk.estimate());
    }

    // bloom insert, sized for the stream
    {
        const N: u64 = 2_000_000;
        let mut bf = BloomFilterBuilder::with_accuracy(N, 0.01).build();
        let t0 = Instant::now();
        for i in 0..N {
            bf.insert(black_box(i));
        }
        let dt = t0.elapsed().as_secs_f64();
        rec(&mut out, "bloom_insert", N, dt, bf.bits_used() as f64);
    }

    // countmin weighted update, 3x1024
    {
        const N: u64 = 4_000_000;
        let mut cm: CountMinSketch<u64> = CountMinSketch::new(3, 1024);
        let t0 = Instant::now();
        for i in 0..N {
            cm.update_with_weight(black_box(i), 1);
        }
        let dt = t0.elapsed().as_secs_f64();
        rec(&mut out, "countmin_update", N, dt, cm.estimate(7u64) as f64);
    }

    // frequencies update, map 1024, 100k distinct keys (forces purges)
    {
        const N: u64 = 2_000_000;
        let mut fi: FrequentItemsSketch<i64> = FrequentItemsSketch::new(1024);
        let t0 = Instant::now();
        for i in 0..N {
            fi.update(black_box((i % 100_000) as i64));
        }
        let dt = t0.elapsed().as_secs_f64();
        rec(&mut out, "frequencies_update", N, dt, fi.estimate(&7) as f64);
    }

    // tdigest update, k=200
    {
        const N: u64 = 4_000_000;
        let mut td = TDigestMut::new(200);
        let t0 = Instant::now();
        for i in 0..N {
            td.update(black_box(i as f64));
        }
        let dt = t0.elapsed().as_secs_f64();
        let q = td.quantile(0.5).unwrap_or(f64::NAN);
        rec(&mut out, "tdigest_update", N, dt, q);
    }

    println!("{{{}}}", out.join(", "));
}
