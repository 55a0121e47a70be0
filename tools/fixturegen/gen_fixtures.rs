//! Golden wire-fixture generator: builds every sketch family with
//! deterministic update sequences and dumps the serialized blobs plus
//! a manifest (family, params, n, estimate) for cross-implementation
//! byte-parity tests in the Python engine.

use std::env;
use std::fs;
use std::path::Path;

use datasketches::bloom::BloomFilterBuilder;
use datasketches::cpc::CpcSketch;
use datasketches::countmin::CountMinSketch;
use datasketches::frequencies::FrequentItemsSketch;
use datasketches::hll::{HllSketch, HllType};
use datasketches::tdigest::TDigestMut;
use datasketches::theta::ThetaSketch;

struct Entry {
    file: String,
    family: String,
    params: String,
    n: u64,
    estimate: f64,
}

fn write_blob(dir: &Path, name: &str, bytes: &[u8]) -> String {
    let file = format!("{name}.sk");
    fs::write(dir.join(&file), bytes).expect("write blob");
    file
}

fn main() {
    let out = env::args().nth(1).unwrap_or_else(|| "fixtures".to_string());
    let dir = Path::new(&out);
    fs::create_dir_all(dir).expect("mkdir");
    let mut manifest: Vec<Entry> = Vec::new();

    // ---- theta: v3 (uncompressed) + v4 (compressed), u64 updates ----
    for n in [0u64, 100, 20000] {
        let mut sk = ThetaSketch::builder().lg_k(12).build();
        for i in 0..n {
            sk.update(i);
        }
        let compact = sk.compact(true);
        let v3 = compact.serialize();
        let v4 = compact.serialize_compressed();
        manifest.push(Entry {
            file: write_blob(dir, &format!("theta_lgk12_n{n}_v3"), &v3),
            family: "theta_v3".into(),
            params: "lg_k=12,updates=u64:0..n".into(),
            n,
            estimate: compact.estimate(),
        });
        manifest.push(Entry {
            file: write_blob(dir, &format!("theta_lgk12_n{n}_v4"), &v4),
            family: "theta_v4".into(),
            params: "lg_k=12,updates=u64:0..n".into(),
            n,
            estimate: compact.estimate(),
        });
    }
    // f64 updates exercise canonical_double
    {
        let mut sk = ThetaSketch::builder().lg_k(12).build();
        for i in 0..500u64 {
            sk.update_f64(i as f64 * 0.5);
        }
        let compact = sk.compact(true);
        manifest.push(Entry {
            file: write_blob(dir, "theta_lgk12_f64_v3", &compact.serialize()),
            family: "theta_v3_f64".into(),
            params: "lg_k=12,updates=f64:0.5*i,i<500".into(),
            n: 500,
            estimate: compact.estimate(),
        });
    }

    // ---- hll: each target type x regime (list/set/dense) ----
    for (tname, t) in [
        ("hll4", HllType::Hll4),
        ("hll6", HllType::Hll6),
        ("hll8", HllType::Hll8),
    ] {
        for n in [4u64, 60, 15000] {
            let mut sk = HllSketch::new(11, t);
            for i in 0..n {
                sk.update(i);
            }
            manifest.push(Entry {
                file: write_blob(dir, &format!("hll_lgk11_{tname}_n{n}"), &sk.serialize()),
                family: format!("hll_{tname}"),
                params: "lg_k=11,updates=u64:0..n".into(),
                n,
                estimate: sk.estimate(),
            });
        }
    }

    // ---- cpc: flavors empty/sparse/hybrid/pinned/sliding ----
    for n in [0u64, 20, 500, 3000, 100000] {
        let mut sk = CpcSketch::new(11);
        for i in 0..n {
            sk.update(i);
        }
        manifest.push(Entry {
            file: write_blob(dir, &format!("cpc_lgk11_n{n}"), &sk.serialize()),
            family: "cpc".into(),
            params: "lg_k=11,updates=u64:0..n".into(),
            n,
            estimate: sk.estimate(),
        });
    }

    // ---- bloom ----
    {
        let mut bf = BloomFilterBuilder::with_accuracy(10_000, 0.01).build();
        for i in 0..1000u64 {
            bf.insert(i);
        }
        manifest.push(Entry {
            file: write_blob(dir, "bloom_acc10k_n1000", &bf.serialize()),
            family: "bloom".into(),
            params: "with_accuracy(10000,0.01),updates=u64:0..n".into(),
            n: 1000,
            estimate: bf.bits_used() as f64,
        });
    }

    // ---- countmin (u64 weights) ----
    {
        let mut cm: CountMinSketch<u64> = CountMinSketch::new(3, 1024);
        for i in 0..200u64 {
            cm.update_with_weight(i, i + 1);
        }
        manifest.push(Entry {
            file: write_blob(dir, "countmin_3x1024_n200", &cm.serialize()),
            family: "countmin_u64".into(),
            params: "num_hashes=3,num_buckets=1024,update_with_weight(u64 i, i+1)".into(),
            n: 200,
            estimate: cm.estimate(7u64) as f64,
        });
    }

    // ---- frequencies: i64 + String items ----
    {
        let mut fi: FrequentItemsSketch<i64> = FrequentItemsSketch::new(64);
        for i in 0..40i64 {
            fi.update_with_count(i, (i + 1) as u64);
        }
        manifest.push(Entry {
            file: write_blob(dir, "freq_i64_m64_n40", &fi.serialize()),
            family: "frequencies_i64".into(),
            params: "max_map_size=64,update_with_count(i, i+1)".into(),
            n: 40,
            estimate: fi.estimate(&7) as f64,
        });
        let mut fs_: FrequentItemsSketch<String> = FrequentItemsSketch::new(64);
        for i in 0..40i64 {
            fs_.update_with_count(format!("item_{i}"), (i + 1) as u64);
        }
        manifest.push(Entry {
            file: write_blob(dir, "freq_str_m64_n40", &fs_.serialize()),
            family: "frequencies_str".into(),
            params: "max_map_size=64,update_with_count('item_i', i+1)".into(),
            n: 40,
            estimate: fs_.estimate(&"item_7".to_string()) as f64,
        });
    }

    // ---- tdigest ----
    {
        let mut td = TDigestMut::new(200);
        for i in 0..10000u64 {
            td.update(i as f64);
        }
        let q50 = td.quantile(0.5).unwrap_or(f64::NAN);
        manifest.push(Entry {
            file: write_blob(dir, "tdigest_k200_n10000", &td.serialize()),
            family: "tdigest".into(),
            params: "k=200,update(f64 i),quantile(0.5) as estimate".into(),
            n: 10000,
            estimate: q50,
        });
    }

    // manifest.json (hand-rolled; estimates with full precision)
    let mut s = String::from("[\n");
    for (i, e) in manifest.iter().enumerate() {
        s.push_str(&format!(
            "  {{\"file\": \"{}\", \"family\": \"{}\", \"params\": \"{}\", \"n\": {}, \"estimate\": {:?}}}{}\n",
            e.file,
            e.family,
            e.params,
            e.n,
            e.estimate,
            if i + 1 == manifest.len() { "" } else { "," }
        ));
    }
    s.push_str("]\n");
    fs::write(dir.join("manifest.json"), s).expect("write manifest");
    eprintln!("wrote {} fixtures to {}", manifest.len(), out);
}
