"""`mptpu onestep` end-to-end (multiPrime_onestep_all.py equivalent) and the
run-subcommand config/flag precedence."""

import os

import numpy as np
import pytest

from multiprime_tpu.cli import main as cli


@pytest.fixture()
def small_cluster(tmp_path):
    rng = np.random.default_rng(11)
    base = "".join(rng.choice(list("ACGT"), size=400))
    seqs = []
    for i in range(8):
        s = list(base)
        for _ in range(4):
            s[int(rng.integers(len(s)))] = str(rng.choice(list("ACGT")))
        seqs.append("".join(s))
    msa = tmp_path / "c.tmsa"
    ref = tmp_path / "c.tfa"
    for path in (msa, ref):
        with open(path, "w") as f:
            for i, s in enumerate(seqs):
                f.write(">seq%d\n%s\n" % (i, s))
    return str(msa), str(ref)


def test_onestep_end_to_end(tmp_path, small_cluster):
    msa, ref = small_cluster
    out1 = str(tmp_path / "d.top.primer.out")
    out2 = str(tmp_path / "d.candidate.txt")
    rc = cli.main(["onestep", "-i", msa, "-r", ref, "-s", "100,300",
                   "-f", "0.6", "--out1", out1, "-o", out2])
    assert rc == 0
    assert os.path.getsize(out1) > 0
    # pair txt + fasta + xls siblings (get_multiPrime layout)
    assert os.path.exists(out2)
    stem = out2.strip(".txt")
    assert os.path.exists(stem + ".fa")
    # coverage scan outputs (off_targets layout)
    target = stem + "_target"
    assert os.path.exists(target)
    assert os.path.exists(target + ".pair.num")
    covered = open(target + ".total.acc.num").read()
    assert "total coverage of primer set (PS) is: 8" in covered


def test_run_config_not_clobbered_by_flag_defaults(tmp_path):
    rng = np.random.default_rng(5)
    base = "".join(rng.choice(list("ACGT"), size=300))
    fa = tmp_path / "in.fa"
    with open(fa, "w") as f:
        for i in range(4):
            s = list(base)
            s[int(rng.integers(len(s)))] = str(rng.choice(list("ACGT")))
            f.write(">s%d desc\n%s\n" % (i, "".join(s)))
    cfg = tmp_path / "cfg.yaml"
    results = tmp_path / "res_from_cfg"
    cfg.write_text(
        "input_fa: %s\n"
        "results_dir: %s\ncoverage: 0.6\nmsa_refine: 0\n" % (fa, results))
    rc = cli.main(["run", "-c", str(cfg)])
    assert rc == 0
    assert results.is_dir()          # yaml results_dir honored
    flag_dir = tmp_path / "res_from_flag"
    rc = cli.main(["run", "-c", str(cfg), "-r", str(flag_dir)])
    assert rc == 0
    assert flag_dir.is_dir()         # explicit flag still wins


def test_onestep_devices_byte_identical(tmp_path, small_cluster):
    """onestep --devices 8 routes the scan through the virtual mesh with
    byte-identical outputs vs --devices 1.  Same output path both runs:
    the candidate txt embeds the path in column 1 (reference format)."""
    import shutil
    msa, ref = small_cluster
    d = tmp_path / "work"
    outs = {}
    for dev in (1, 8):
        if d.exists():
            shutil.rmtree(d)
        d.mkdir()
        out1 = str(d / "d.top.primer.out")
        out2 = str(d / "d.candidate.txt")
        rc = cli.main(["onestep", "-i", msa, "-r", ref, "-s", "100,300",
                       "-f", "0.6", "--devices", str(dev),
                       "--out1", out1, "-o", out2])
        assert rc == 0
        outs[dev] = {}
        for root, _, files in os.walk(d):
            for name in files:
                p = os.path.join(root, name)
                outs[dev][os.path.relpath(p, d)] = open(p, "rb").read()
    assert outs[1].keys() == outs[8].keys()
    for rel in outs[1]:
        assert outs[1][rel] == outs[8][rel], rel
