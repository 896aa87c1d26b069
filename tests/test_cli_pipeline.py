"""CLI + pipeline driver smoke/parity tests."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from multiprime_tpu.cli import main as climain
from multiprime_tpu.thermo import exact as thermo


def run_cli(args):
    return climain.main(args)


def test_tm_cli(capsys):
    run_cli(["tm", "-i", "GGTAYGGYYTCAGRCATC", "-f", "seq"])
    out = capsys.readouterr().out
    assert out.strip().endswith("53.33")


def test_dg_cli(capsys):
    run_cli(["dg", "-i", "ACGT", "-f", "seq", "-g", "H_bonds"])
    out = capsys.readouterr().out
    assert "\t" in out


def test_expand_cli(tmp_path, capsys):
    fa = tmp_path / "p.fa"
    fa.write_text(">x\nAY\n")
    run_cli(["expand", "-i", str(fa)])
    out = capsys.readouterr().out
    assert ">x_0\nAC\n>x_1\nAT\n" == out


def test_seq_format_cli(tmp_path):
    fa = tmp_path / "in.fa"
    fa.write_text(">a extra\n" + "ACGT" * 60 + "\n")
    out = tmp_path / "out.fa"
    run_cli(["seq-format", "-i", str(fa), "-o", str(out)])
    assert out.read_text().startswith(">a\n")


def test_tm_conditions_monovalent_branch():
    # low divalent pushes into the monovalent (GC-dependent) correction
    t1 = thermo.tm_conditions("ACGTACGTACGTACGTAA", div=0.1, dntp=0.25)
    t2 = thermo.tm_conditions("ACGTACGTACGTACGTAA")
    assert t1 != t2


def test_pipeline_mini(tmp_path):
    """Tiny synthetic end-to-end pipeline run."""
    rng = np.random.default_rng(5)
    lut = np.array(list("ACGT"))
    base = "".join(rng.choice(lut, size=500))

    def mutate(s, n=6):
        s = list(s)
        for _ in range(n):
            i = rng.integers(0, len(s))
            s[i] = str(rng.choice(lut))
        return "".join(s)

    fa = tmp_path / "toy.fa"
    with open(fa, "w") as f:
        for i in range(12):
            f.write(">seq%d\n%s\n" % (i, mutate(base)))
    from multiprime_tpu.pipeline.driver import run_pipeline
    pipe, log = run_pipeline(
        None, input_fa=str(fa), results_dir=str(tmp_path / "res"),
        virus_name="toy", coverage=0.5, min_seq_length=100,
        product_size=(100, 600), algo="v20")
    final = tmp_path / "res" / "Primers_set" / "final_maxprimers_set.xls"
    assert final.exists()
    rows = final.read_text().strip().splitlines()
    assert rows[0].startswith("#Primer")
    assert len(rows) >= 2, "no primer pair survived on a clean toy cluster"
    cov = (tmp_path / "res" / "Primers_set" / "Coverage_stast.xls").read_text()
    assert "Total number of sequences:\t12" in cov


def test_pipeline_two_clusters(tmp_path):
    rng = np.random.default_rng(77)
    lut = np.array(list("ACGT"))
    base_a = "".join(rng.choice(lut, size=600))
    base_b = "".join(rng.choice(lut, size=550))

    def mut(s, n=8):
        s = list(s)
        for _ in range(n):
            s[rng.integers(0, len(s))] = str(rng.choice(lut))
        return "".join(s)

    fa = tmp_path / "two.fa"
    with open(fa, "w") as f:
        for i in range(15):
            f.write(">A%d\n%s\n" % (i, mut(base_a)))
        for i in range(12):
            f.write(">B%d\n%s\n" % (i, mut(base_b)))
    from multiprime_tpu.pipeline.driver import run_pipeline
    pipe, log = run_pipeline(
        None, input_fa=str(fa), results_dir=str(tmp_path / "res"),
        virus_name="two", coverage=0.5, min_seq_length=100,
        product_size=(100, 500), algo="v20")
    clusters = (tmp_path / "res" / "cluster.txt").read_text().splitlines()
    assert len(clusters) == 3          # header + 2 clusters
    xls = (tmp_path / "res" / "Primers_set" /
           "final_maxprimers_set.xls").read_text().splitlines()
    assert len(xls) >= 3               # one pair per cluster
    assert (tmp_path / "res" / "pipeline_metrics.json").exists()


def test_pipeline_cluster_pool_identical(tmp_path):
    """nproc>1 fans clusters out over a fork pool (the Snakemake
    checkpoint fan-out, multiPrime.py --cores); every output must be
    byte-identical to the sequential run.  Both runs use the same
    results path because several reference formats embed the output
    path in column 1."""
    rng = np.random.default_rng(5)
    lut = np.array(list("ACGT"))
    bases = ["".join(rng.choice(lut, size=500)) for _ in range(3)]
    fa = tmp_path / "three.fa"
    with open(fa, "w") as f:
        for b, base in enumerate(bases):
            for i in range(8):
                s = list(base)
                for _ in range(6):
                    s[rng.integers(0, len(s))] = str(rng.choice(lut))
                f.write(">%c%d\n%s\n" % (65 + b, i, "".join(s)))
    from multiprime_tpu.pipeline.driver import run_pipeline
    res = tmp_path / "res"
    kw = dict(input_fa=str(fa), results_dir=str(res), virus_name="three",
              coverage=0.5, min_seq_length=100, product_size=(100, 400),
              algo="v20")
    run_pipeline(None, **kw)
    seq_dir = tmp_path / "res_seq"
    os.rename(res, seq_dir)
    run_pipeline(None, nproc=3, **kw)
    skip = ("pipeline_metrics.json",)
    seq_files = sorted(p for p in seq_dir.rglob("*") if p.is_file())
    assert seq_files
    for p in seq_files:
        rel = p.relative_to(seq_dir)
        if any(str(rel).endswith(s) for s in skip):
            continue
        assert (res / rel).read_bytes() == p.read_bytes(), str(rel)


def test_reference_yaml_key_parity():
    """Every key in the shipped multiPrime.yaml lands in PipelineConfig
    (multiPrime.yaml:38-159).  `scripts_dir` is n/a: the engines are
    in-package, there is no scripts directory to point at."""
    import yaml
    from multiprime_tpu.pipeline.driver import PipelineConfig
    path = "/root/reference/multiPrime.yaml"
    raw = yaml.safe_load(open(path))
    cfg = PipelineConfig.from_yaml(path)
    not_applicable = {"scripts_dir"}
    landed = {
        "input_dir": cfg.input_dir, "results_dir": cfg.results_dir,
        "log_dir": cfg.log_dir, "virus": cfg.virus_name,
        "identity": cfg.identity, "seq_number_ANI": cfg.seq_number_ani,
        "ani": cfg.ani, "drop": cfg.drop_or_merge, "max_seq": cfg.max_seq,
        "dege_number": cfg.dege_number, "degeneracy": cfg.degeneracy,
        "primer_len": cfg.primer_len, "variation": cfg.variation,
        "nproc": cfg.nproc, "entropy": cfg.entropy,
        "coordinate": cfg.coordinate, "coverage": cfg.coverage,
        "PRODUCT_size": cfg.product_size, "gc_content": cfg.gc_content,
        "distance": cfg.distance, "end": cfg.end, "adaptor": cfg.adaptor,
        "core_number": cfg.core_number, "step": cfg.step,
        "method": cfg.method,
    }
    missing = set(raw) - set(landed) - not_applicable
    assert not missing, "yaml keys not mapped: %s" % sorted(missing)
    # spot-check the previously-dropped keys land with the right values
    assert cfg.seq_number_ani == raw["seq_number_ANI"] == 1
    assert cfg.core_number == raw["core_number"] == 10
    assert cfg.drop_or_merge is True          # drop: "F" -> merge
    assert cfg.log_dir == raw["log_dir"]
    assert cfg.input_dir == raw["input_dir"]
    assert cfg.virus_name == "CDS_20727"
    assert cfg.product_size == (150, 1200)


def test_model_yaml_key(tmp_path):
    """`Model:` (multiPrime.yaml:30-33) maps fast -> v20, normal -> v2;
    an explicit algo key wins."""
    from multiprime_tpu.pipeline.driver import PipelineConfig
    y = tmp_path / "a.yaml"
    y.write_text("Model: normal\n")
    assert PipelineConfig.from_yaml(str(y)).algo == "v2"
    y.write_text("Model: fast\n")
    assert PipelineConfig.from_yaml(str(y)).algo == "v20"
    y.write_text("Model: normal\nalgo: v16\n")
    assert PipelineConfig.from_yaml(str(y)).algo == "v16"
    # unknown values warn and keep the default instead of silently
    # falling into the slow global-optimum engine (ADVICE r4)
    y.write_text("Model: fsat\n")
    with pytest.warns(UserWarning, match="fast/normal"):
        cfg = PipelineConfig.from_yaml(str(y))
    assert cfg.algo == "v20"


def test_pipeline_log_dir(tmp_path):
    """log_dir produces per-stage + per-cluster log files with the
    reference's `INFO <ts> Total times:` line (multiPrime.py:182-218)."""
    fa = tmp_path / "toy.fa"
    rng = np.random.default_rng(3)
    lut = np.array(list("ACGT"))
    base = "".join(rng.choice(lut, size=400))
    with open(fa, "w") as f:
        for i in range(8):
            s = list(base)
            for _ in range(5):
                s[rng.integers(0, len(s))] = str(rng.choice(lut))
            f.write(">s%d\n%s\n" % (i, "".join(s)))
    from multiprime_tpu.pipeline.driver import run_pipeline
    logd = tmp_path / "logs"
    run_pipeline(None, input_fa=str(fa), results_dir=str(tmp_path / "res"),
                 virus_name="toy", coverage=0.5, min_seq_length=100,
                 product_size=(100, 390), log_dir=str(logd))
    logs = sorted(p.name for p in logd.glob("*.log"))
    assert "seq_format.log" in logs
    assert any(n.startswith("multiPrime_Cluster_") for n in logs)
    assert any(n.startswith("get_multiPrime_Cluster_") for n in logs)
    body = (logd / "seq_format.log").read_text()
    assert "Total times:" in body


def test_pipeline_original_variant(tmp_path):
    """multiPrime-original.py flow: no dict pickle, no ANI history, no
    Clusters_target, core_V15 engine by default; still solves end-to-end."""
    from multiprime_tpu.cli import main as cli
    res = tmp_path / "res"
    cli.main(["run", "-i", "/root/reference/test_data/test.fa",
              "-r", str(res), "--variant", "original",
              "--coverage", "0.6"])
    assert not (res / "Total_fa" / "test.format.dict").exists()
    assert not (res / "history.txt").exists()
    assert not (res / "Clusters_target").exists()
    assert (res / "Primers_set" / "final_maxprimers_set.xls").exists()
    assert (res / "Core_primers_set" / "BWT_coverage").exists()
    # no unmatched.fa without a dict (reference -d None behaviour)
    assert not list((res / "Core_primers_set" / "BWT_coverage")
                    .glob("*unmatched*"))


def test_cluster_shard_fanout_identical(tmp_path):
    """Multi-host cluster-axis sharding: two `cluster_shard` worker runs
    over one results dir, then an aggregating resume run, must reproduce
    the sequential run byte-for-byte.  Workers must defer the solve tail
    while other shards' candidate files are missing."""
    rng = np.random.default_rng(41)
    lut = np.array(list("ACGT"))
    bases = ["".join(rng.choice(lut, size=480)) for _ in range(3)]
    fa = tmp_path / "three.fa"
    with open(fa, "w") as f:
        for b, base in enumerate(bases):
            for i in range(8):
                s = list(base)
                for _ in range(6):
                    s[rng.integers(0, len(s))] = str(rng.choice(lut))
                f.write(">%c%d\n%s\n" % (65 + b, i, "".join(s)))
    from multiprime_tpu.pipeline.driver import run_pipeline
    res = tmp_path / "res"
    kw = dict(input_fa=str(fa), results_dir=str(res), virus_name="three",
              coverage=0.5, min_seq_length=100, product_size=(100, 400),
              algo="v20")
    run_pipeline(None, **kw)
    seq_dir = tmp_path / "res_seq"
    os.rename(res, seq_dir)
    _, log0 = run_pipeline(None, cluster_shard="0/2", **kw)
    assert any("deferred" in str(row[1]) for row in log0)
    assert not (res / "Primers_set" / "final_maxprimers_set.xls").exists()
    cands = list((res / "Clusters_cprimer").glob("*.candidate.primers.txt"))
    assert len(cands) == 2          # 3 clusters strided 2 ways: shard 0 gets 2
    _, log1 = run_pipeline(None, cluster_shard="1/2", **kw)
    # shard 1 completed the fan-out, so it runs the aggregate tail itself
    assert not any("deferred" in str(row[1]) for row in log1)
    # ... and releases the aggregate lock on the way out, so a later
    # sharded run on this dir is not permanently deferred (ADVICE r4)
    assert not (res / "Primers_set" / ".aggregate.lock").exists()
    run_pipeline(None, **kw)        # idempotent resume (everything cached)
    skip = ("pipeline_metrics.json",)
    for p in sorted(q for q in seq_dir.rglob("*") if q.is_file()):
        rel = p.relative_to(seq_dir)
        if any(str(rel).endswith(s) for s in skip):
            continue
        assert (res / rel).read_bytes() == p.read_bytes(), str(rel)


def test_cluster_shard_worker_waits_for_upstream(tmp_path, monkeypatch):
    """A non-zero shard on a results dir with no cluster.txt must wait for
    shard 0's upstream (and time out cleanly via MPTPU_SHARD_WAIT_S)
    instead of racing the upstream stages."""
    fa = tmp_path / "toy.fa"
    fa.write_text(">a\n" + "ACGT" * 100 + "\n")
    monkeypatch.setenv("MPTPU_SHARD_WAIT_S", "0.2")
    from multiprime_tpu.pipeline.driver import run_pipeline
    with pytest.raises(TimeoutError, match="cluster_shard"):
        run_pipeline(None, input_fa=str(fa), results_dir=str(tmp_path / "r"),
                     virus_name="toy", cluster_shard="1/2")
    # shard 0 is the upstream owner: same empty dir, no wait
    run_pipeline(None, input_fa=str(fa), results_dir=str(tmp_path / "r"),
                 virus_name="toy", cluster_shard="0/2", min_seq_length=100,
                 coverage=0.5, product_size=(100, 390))
    assert (tmp_path / "r" / "cluster.txt").exists()


def test_scan_term_len_resolves_to_primer_len(tmp_path):
    """scan_term_len=-1 resolves to the configured primer_len (rule 19's
    -l {primer_len}), visible in the core/final term.fa l-mers."""
    rng = np.random.default_rng(19)
    lut = np.array(list("ACGT"))
    base = "".join(rng.choice(lut, size=520))
    fa = tmp_path / "p.fa"
    with open(fa, "w") as f:
        for i in range(6):
            s = list(base)
            for _ in range(5):
                s[rng.integers(0, len(s))] = str(rng.choice(lut))
            f.write(">x%d\n%s\n" % (i, "".join(s)))
    from multiprime_tpu.pipeline.driver import run_pipeline
    run_pipeline(None, input_fa=str(fa), results_dir=str(tmp_path / "r"),
                 virus_name="p", coverage=0.5, min_seq_length=100,
                 product_size=(100, 400), primer_len=20)
    term = (tmp_path / "r" / "Primers_set" /
            "final_maxprimers_set.term.fa").read_text()
    lmers = [l for l in term.splitlines() if not l.startswith(">")]
    assert lmers and all(len(l) == 20 for l in lmers)


def test_core_primer_set_tree_shape(tmp_path):
    """Rules 14/16/18/19 (multiPrime.py:340-460): with a core-sized cluster
    the driver must produce every file class present in the golden
    Core_primers_set/ tree — core txt2fa dir + .number, core_PCR_product/
    + core_Coverage_stast.xls, the core .fa QC reports, the core .term.fa,
    and the BWT_coverage outputs scanned from the CORE set."""
    from multiprime_tpu.pipeline.driver import run_pipeline
    res = tmp_path / "res"
    run_pipeline(None, input_fa="/root/reference/test_data/test.fa",
                 results_dir=str(res), virus_name="test", coverage=0.6,
                 core_number=3)
    core = res / "Core_primers_set"
    golden = "/root/reference/test_data/results/Core_primers_set"
    # every golden file class must exist (cluster-specific basenames inside
    # the two directories differ by input, so compare the fixed names plus
    # per-directory non-emptiness)
    fixed = [p for p in os.listdir(golden)
             if os.path.isfile(os.path.join(golden, p))]
    for name in fixed:
        assert (core / name).exists(), name
    for sub in ("core_candidate_primers_sets", "core_PCR_product"):
        assert [p for p in (core / sub).iterdir()
                if p.name != ".snakemake_timestamp"], sub
    for name in os.listdir(os.path.join(golden, "BWT_coverage")):
        assert (core / "BWT_coverage" / name).exists(), name
    # rule 19 contract: the scan ran on the CORE set (3'-l-mer primer_len,
    # term 1, 50..2000 products) — core term.fa holds the expanded l-mers
    body = (core / "core_final_maxprimers_set.term.fa").read_text()
    lmers = [l for l in body.splitlines() if not l.startswith(">")]
    assert lmers and all(len(l) == 18 for l in lmers)
    out_rows = (core / "BWT_coverage" /
                "core_final_maxprimers_set.out").read_text().splitlines()
    assert out_rows[0].startswith("Chrom")
    for row in out_rows[1:]:
        length = int(row.split("\t")[-1])
        assert 50 < length < 2000
    # no core-sized cluster -> fallback final-set scan (small-input runs
    # still get coverage validation)
    res2 = tmp_path / "res2"
    run_pipeline(None, input_fa="/root/reference/test_data/test.fa",
                 results_dir=str(res2), virus_name="test", coverage=0.6)
    assert (res2 / "Core_primers_set" / "BWT_coverage" /
            "final_maxprimers_set.out").exists()
    assert not (res2 / "Core_primers_set" /
                "core_final_maxprimers_set.xls").exists()


def test_pipeline_resume_regenerates_torn_sidecars(tmp_path):
    """A run killed while the forked sidecar child was writing leaves a
    valid-looking design table with missing/torn JSONs; the resume must
    regenerate the design instead of crashing on json.load."""
    import glob
    import os

    rng = np.random.default_rng(7)
    lut = np.array(list("ACGT"))
    base = "".join(rng.choice(lut, size=400))

    def mutate(s, n=5):
        s = list(s)
        for _ in range(n):
            i = rng.integers(0, len(s))
            s[i] = str(rng.choice(lut))
        return "".join(s)

    fa = tmp_path / "toy.fa"
    with open(fa, "w") as f:
        for i in range(8):
            f.write(">seq%d\n%s\n" % (i, mutate(base)))
    from multiprime_tpu.pipeline.driver import run_pipeline
    kwargs = dict(input_fa=str(fa), results_dir=str(tmp_path / "res"),
                  virus_name="toy", coverage=0.5, min_seq_length=100,
                  product_size=(100, 300), algo="v20")
    run_pipeline(None, **kwargs)
    tables = glob.glob(str(tmp_path / "res" / "Clusters_primer" /
                           "*.top.primer.out"))
    assert tables
    gap = tables[0] + ".gap_seq_id_json"
    want = open(gap, "rb").read()
    # simulate the kill window: one sidecar missing, the other torn,
    # downstream outputs cleared so the per-cluster stage re-runs
    os.remove(gap)
    non = tables[0] + ".non_coverage_seq_id_json"
    with open(non, "r+b") as f:
        f.truncate(max(os.path.getsize(non) // 2, 1))
    for cand in glob.glob(str(tmp_path / "res" / "Clusters_cprimer" / "*")):
        os.remove(cand)
    run_pipeline(None, **kwargs)
    assert open(gap, "rb").read() == want
    assert open(non, "rb").read().rstrip().endswith(b"}")


def test_pcr_products_modes(tmp_path):
    """pcr_products full/gzip/summary: identical Coverage_stast.xls and
    coverage sets; gzip bodies decompress to the full bodies; summary
    writes no per-pair FASTAs (the 21k-scale 12.5 GB tail opt-out)."""
    import gzip

    from multiprime_tpu.validate import pcr

    rng = np.random.default_rng(21)
    lut = np.array(list("ACGT"))
    f_p = "".join(rng.choice(lut, size=18))
    r_p = "".join(rng.choice(lut, size=18))
    rc = r_p.translate(str.maketrans("ATGC", "TACG"))[::-1]
    ref = tmp_path / "ref.fa"
    with open(ref, "w") as fh:
        for i in range(9):
            body = "".join(rng.choice(lut, size=300))
            if i % 2 == 0:
                body = body[:40] + f_p + body[58:220] + rc + body[238:]
            fh.write(">t%d\n%s\n" % (i, body))
    pairs = {"C0_1_F_C0_200": (f_p, r_p)}
    outs = {}
    for mode in ("full", "gzip", "summary"):
        od = tmp_path / mode
        stast = tmp_path / (mode + ".xls")
        cov, uncov = pcr.run(pairs, str(ref), str(od), str(stast),
                             products=mode)
        outs[mode] = (stast.read_text(), cov, uncov,
                      sorted(p.name for p in od.iterdir()))
    assert outs["full"][0] == outs["gzip"][0] == outs["summary"][0]
    assert outs["full"][1] == outs["gzip"][1] == outs["summary"][1]
    assert len(outs["full"][1]) == 5          # planted products found
    assert outs["summary"][3] == []
    for name in outs["full"][3]:
        full_body = (tmp_path / "full" / name).read_bytes()
        gz_body = gzip.decompress(
            (tmp_path / "gzip" / (name + ".gz")).read_bytes())
        assert gz_body == full_body


def test_pcr_scan_overlap_forked_subprocess(tmp_path):
    """The forked PCR/scan overlap only engages when no jax backend is
    live (fork_safe) — which never happens inside this pytest process, so
    drive a jax-free subprocess and compare its results tree against the
    in-process (sequential) run."""
    import subprocess
    import sys

    rng = np.random.default_rng(31)
    lut = np.array(list("ACGT"))
    base = "".join(rng.choice(lut, size=500))
    fa = tmp_path / "one.fa"
    with open(fa, "w") as f:
        for i in range(10):
            s = list(base)
            for _ in range(6):
                s[rng.integers(0, len(s))] = str(rng.choice(lut))
            f.write(">s%d\n%s\n" % (i, "".join(s)))
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "from multiprime_tpu.models import mcdpd\n"
        "assert mcdpd.fork_safe(), 'subprocess must start jax-free'\n"
        "from multiprime_tpu.pipeline.driver import run_pipeline\n"
        "run_pipeline(None, input_fa=%r, results_dir=%r,\n"
        "             virus_name='one', coverage=0.5, min_seq_length=100,\n"
        "             product_size=(100, 400))\n"
        % (str(pathlib_repo_root()), str(fa), str(tmp_path / "res"))
    )
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    res = tmp_path / "res"
    run_pipeline_mod = __import__("multiprime_tpu.pipeline.driver",
                                  fromlist=["run_pipeline"])
    seq = tmp_path / "res_seq"
    run_pipeline_mod.run_pipeline(
        None, input_fa=str(fa), results_dir=str(seq), virus_name="one",
        coverage=0.5, min_seq_length=100, product_size=(100, 400))
    # the append-mode Coverage_stast.xls and the scan outputs must agree
    cov_a = (res / "Primers_set" / "Coverage_stast.xls").read_text()
    cov_b = (seq / "Primers_set" / "Coverage_stast.xls").read_text()
    assert cov_a == cov_b and cov_a.strip()
    bwt = ("Core_primers_set", "BWT_coverage",
           "core_final_maxprimers_set.out")
    assert (res.joinpath(*bwt)).read_bytes() == \
        (seq.joinpath(*bwt)).read_bytes()


def pathlib_repo_root():
    import pathlib
    return pathlib.Path(__file__).resolve().parent.parent
