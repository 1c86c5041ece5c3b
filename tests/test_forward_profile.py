"""Smoke-pin `utils.forward_profile`: the per-layer roofline tool must keep
tracing every block of the fast forward (it is the written evidence for the
forward-at-XLA-floor claim in ROUND3.md). Tiny shapes, CPU."""

from unetdc_tpu.utils.forward_profile import profile_forward


def test_profile_forward_traces_all_layers():
    rows = profile_forward(batch=1, size=32, iters=2, verbose=False)
    layer_rows = {k: v for k, v in rows.items() if not k.startswith("_")}
    assert len(layer_rows) == 15  # every block of forward_folded
    for name, r in layer_rows.items():
        assert r["ms"] >= 0, name
        assert r["bound"] in ("compute", "HBM", "sub-floor"), name
    # conv stages must carry FLOP accounting; glue ops are zero-FLOP
    assert rows["dec4 (concat+dc 1024->512)"]["useful_gflop"] > 0
    assert rows["pool1 (from pair)"]["useful_gflop"] == 0
    assert rows["_whole_forward_ms"] > 0
    assert rows["_sum_of_layers_ms"] > 0
