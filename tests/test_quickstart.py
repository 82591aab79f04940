"""The examples/quickstart.py walkthrough must keep running — it is the
switch-from-the-reference artifact."""

import importlib.util
from pathlib import Path


def test_quickstart_end_to_end(spark, tmp_path):
    path = Path(__file__).resolve().parent.parent / "examples" / "quickstart.py"
    spec = importlib.util.spec_from_file_location("quickstart", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = mod.main(spark, str(tmp_path))
    assert out["top_hit"] == "v0"           # query IS v0's vector
    assert set(out["filtered_ids"]) <= {f"v{i}" for i in range(0, 20, 2)}
    assert out["ann_hit"] == "v0"
    assert out["restored_count"] == 50
    assert out["bulk_rows"] == 15           # 5 queries x k=3
    assert 0 < out["curated"] <= 500
    assert out["packed_bins"] > 0


def test_event_analytics_example_end_to_end(spark):
    """examples/event_analytics.py must keep running — the event tier's
    user-facing walkthrough, including the r11 streaming-funnel refresh
    loop (its own assertions pin stream == batch internally)."""
    path = (
        Path(__file__).resolve().parent.parent
        / "examples" / "event_analytics.py"
    )
    spec = importlib.util.spec_from_file_location("event_analytics", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = mod.main(spark)
    assert out["n_sessions"] == out["n_sessions_streamed"]
    assert out["funnel_step1_users"] >= out["funnel_step2_users"] >= (
        out["funnel_step3_users"]
    )
    assert out["funnel_users_streamed"] == out["funnel_step1_users"]


def test_corpus_reports_example_end_to_end(spark):
    """examples/corpus_reports.py — the mergeable-summary algebra
    walkthrough (r11) must keep running; its own assertions pin
    incremental == one-shot, MG == exact at covering k, and the
    exemplar merge identity."""
    path = (
        Path(__file__).resolve().parent.parent
        / "examples" / "corpus_reports.py"
    )
    spec = importlib.util.spec_from_file_location("corpus_reports", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = mod.main(spark)
    assert out["refresh_equals_one_shot"] is True
    assert out["total_docs"] > 0
    assert out["sketch_langs"] > 0
    assert out["mg_rows"] == out["top_sources_rows"]
    assert out["exemplar_rows"] > 0
