"""Tests for the Structured Streaming surface and multimodal plumbing."""

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def test_windowed_counts_stream_matches_batch(spark):
    from imops_spark.functions.events import load_events, tumbling_window_df
    from imops_spark.streaming.events import (
        run_stream_to_memory,
        stream_events,
        windowed_counts_stream,
    )

    stream = stream_events(spark, SF)
    agg = windowed_counts_stream(stream, minutes=5)
    got = run_stream_to_memory(agg, "win_counts", spark, mode="complete")
    got_rows = {
        (r["win_start"] // 300, r["event_type"]): (r["n"], round(r["sum_value"], 4))
        for r in got.collect()
    }
    batch = tumbling_window_df(load_events(spark, SF), minutes=5)
    exp_rows = {
        (r["win"], r["event_type"]): (r["n"], round(r["sum_value"], 4))
        for r in batch.collect()
    }
    assert got_rows == exp_rows


def test_dedup_stream(spark):
    from imops_spark.streaming.events import dedup_stream, run_stream_to_memory, stream_events

    stream = stream_events(spark, SF)
    out = run_stream_to_memory(dedup_stream(stream), "dedup_ev", spark, mode="append")
    rows = out.select("user_id", "event_type").collect()
    pairs = [(r["user_id"], r["event_type"]) for r in rows]
    assert len(pairs) == len(set(pairs))
    assert len(pairs) > 0


def test_multimodal_features_and_resize(spark):
    from imops_spark.functions.multimodal import (
        fake_decode_image,
        image_features_df,
        make_items,
        resize_images_df,
    )

    items = [
        {"item_id": i, "modality": "image", "data": bytes([i]) * 64,
         "width": 16, "height": 12, "channels": 3, "format": "fake"}
        for i in range(4)
    ]
    df = make_items(spark, items)
    feats = {r["item_id"]: r for r in image_features_df(df).collect()}
    assert set(feats) == {0, 1, 2, 3}
    for i in range(4):
        img = fake_decode_image(bytes([i]) * 64, 16, 12, 3).astype(np.float64)
        assert abs(feats[i]["mean_c0"] - img[..., 0].mean()) < 1e-9

    resized = resize_images_df(df, out_w=8, out_h=6).collect()
    assert len(resized) == 4
    for r in resized:
        assert r["meta"]["width"] == 8 and r["meta"]["height"] == 6
        assert len(r["data"]) == 8 * 6 * 3


def test_multimodal_real_decode_stubbed(spark):
    from imops_spark.functions.multimodal import image_features_df, make_items

    df = make_items(
        spark,
        [{"item_id": 0, "modality": "image", "data": b"x" * 16,
          "width": 4, "height": 4, "channels": 1, "format": "png"}],
    )
    with pytest.raises(Exception):  # NotImplementedError surfaces as Py4J error
        image_features_df(df, decode="real").collect()


def test_frame_sampling(spark):
    from imops_spark.functions.multimodal import make_items, sample_frames_df

    payload = bytes(range(100)) * 6  # 600 bytes, 6 frames of 100
    df = make_items(
        spark,
        [{"item_id": 7, "modality": "video", "data": payload, "n_frames": 6, "format": "fake"}],
    )
    frames = sample_frames_df(df, every_n=2).collect()
    assert [r["frame_index"] for r in sorted(frames, key=lambda r: r["frame_index"])] == [0, 2, 4]
    for r in frames:
        assert len(r["frame_data"]) == 100
