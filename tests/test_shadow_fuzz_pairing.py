"""Randomized live-shadow fuzz for pairing: our v20 design output feeds BOTH
the reference get_multiPrime Primers_filter and our PairingEngine across
random knob combinations; txt/xls/fa must match byte-for-byte.

(The design table itself is fuzz-verified window-for-window against the
reference engine in test_shadow_fuzz.py, so feeding both sides the same
table isolates pairing drift.)"""

import importlib.util
import pathlib
import sys

import numpy as np
import pytest

from multiprime_tpu.models import mcdpd
from .conftest import requires_reference
from .test_shadow_fuzz import _fuzz_msa

REF_PAIR = "/root/reference/scripts/get_multiPrime.py"

ADAPTORS = [
    "TCTTTCCCTACACGACGCTCTTCCGATCT,TGGAGTTCAGACGTGTGCTCTTCCGATCT",
    "TCTTTCCCTACACGACGCTCTTCCGATCT,TCTTTCCCTACACGACGCTCTTCCGATCT",
]


@requires_reference
@pytest.mark.slow
@pytest.mark.parametrize("seed", range(4))
def test_fuzz_shadow_pairing(seed, tmp_path):
    rng = np.random.default_rng(2000 + seed)
    size = str(rng.choice(["100,300", "120,360", "150,420"]))
    fraction = float(rng.choice([0.5, 0.6, 0.7]))
    end_dege = int(rng.choice([4, 9]))
    diff_tm = float(rng.choice([2, 5, 8]))
    maxseq = int(rng.choice([0, 0, 24]))
    adaptor = str(rng.choice(ADAPTORS))

    # longer MSAs than the design fuzz so the product band has room
    recs = _fuzz_msa(seed + 100)
    msa = tmp_path / "fz.msa"
    msa.write_text("".join("%s\n%s\n" % r for r in recs))
    tfa = tmp_path / "fz.tfa"
    tfa.write_text("".join("%s\n%s\n" % (h, s.replace("-", ""))
                           for h, s in recs))

    ids, chars = mcdpd.parse_msa(str(msa))
    params = mcdpd.DesignParams(
        primer_length=18, coverage=fraction, dege_number=4, degeneracy=10,
        variation=1, entropy_threshold=3.6, gc=(0.2, 0.7),
        min_product=int(size.split(",")[0]), coordinate="2,3,-1",
        hairpin_distance=4, algo="v20")
    eng = mcdpd.DesignEngine(params)
    try:
        results = eng.design(ids, chars)
    except ValueError:
        pytest.skip("usable span below min product for this seed")
    if len(results) < 20:
        pytest.skip("too few designed windows to exercise pairing")
    table = tmp_path / "fz.top.primer.out"
    mcdpd.write_table(results, str(table))
    mcdpd.write_sidecars(results, str(table))

    # identical basenames in separate dirs: .xls/.fa embed the outfile stem
    (tmp_path / "ref").mkdir()
    (tmp_path / "mine").mkdir()
    out_ref = tmp_path / "ref" / "fz.candidate.txt"
    out_mine = tmp_path / "mine" / "fz.candidate.txt"

    spec = importlib.util.spec_from_file_location("shadow_pair", REF_PAIR)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["shadow_pair"] = mod
    spec.loader.exec_module(mod)
    mod.Primers_filter(
        ref_file=str(tfa), primer_file=str(table), adaptor=adaptor,
        rep_seq_number=maxseq, distance=4, outfile=str(out_ref),
        diff_Tm=diff_tm, size=size, position=end_dege, nproc=1,
        fraction=fraction).run()

    from multiprime_tpu.cli import main as cli
    cli.main(["pair", "-i", str(table), "-r", str(tfa), "-s", size,
              "-f", str(fraction), "-e", str(end_dege), "-t", str(diff_tm),
              "-m", str(maxseq), "-a", adaptor, "-d", "4", "-p", "1",
              "-o", str(out_mine)])

    ref_txt = out_ref.read_text()
    mine_txt = out_mine.read_text()
    # first field is each file's own abspath
    assert mine_txt.split("\t", 1)[1:] == ref_txt.split("\t", 1)[1:], seed
    assert len(ref_txt.split("\t")) > 10, (seed, "no real pair rows")
    for suffix in (".xls", ".fa"):
        ref_s = str(out_ref).rstrip(".txt") + suffix
        mine_s = str(out_mine).rstrip(".txt") + suffix
        assert open(mine_s).read() == open(ref_s).read(), (seed, suffix)
