

def test_pallas_summary_path_matches_scan(monkeypatch):
    """segment_reads' device-summary path (pallas + on-device boundary
    reduction) must produce identical Segmentations to the scan path."""
    import numpy as np

    from nanopolish_tpu.ops import segmentation_hmm as sh

    rng = np.random.default_rng(3)
    samples_list = []
    scalings = []
    for i in range(5):
        n = int(rng.integers(400, 3000))
        # leader / adapter / polyA / transcript -ish levels
        s = np.concatenate([
            rng.normal(70, 3, 60), rng.normal(110, 5, 150),
            rng.normal(75, 6, 200), rng.normal(108, 3, n),
            rng.normal(90, 12, 400)]).astype(np.float32)
        samples_list.append(s)
        scalings.append((1.0, 0.0, 1.0))
    monkeypatch.setenv("NPT_SEG_IMPL", "scan")
    want = sh.segment_reads(samples_list, scalings)
    monkeypatch.setenv("NPT_SEG_IMPL", "pallas")
    got = sh.segment_reads(samples_list, scalings)
    assert [tuple(g) for g in got] == [tuple(w) for w in want]


def test_pallas_summary_path_chunks_over_128(monkeypatch):
    """B > 128 splits into lane-width chunks (dispatch-all, fetch-later);
    results must equal the scan path read for read."""
    import numpy as np

    from nanopolish_tpu.ops import segmentation_hmm as sh

    rng = np.random.default_rng(7)
    samples_list = []
    scalings = []
    for i in range(131):
        n = int(rng.integers(80, 400))
        s = np.concatenate([
            rng.normal(70, 3, 40), rng.normal(110, 5, 60),
            rng.normal(75, 6, 80), rng.normal(108, 3, n),
            rng.normal(90, 12, 100)]).astype(np.float32)
        samples_list.append(s)
        scalings.append((1.0, 0.0, 1.0))
    monkeypatch.setenv("NPT_SEG_IMPL", "scan")
    want = sh.segment_reads(samples_list, scalings)
    monkeypatch.setenv("NPT_SEG_IMPL", "pallas")
    got = sh.segment_reads(samples_list, scalings)
    assert [tuple(g) for g in got] == [tuple(w) for w in want]
