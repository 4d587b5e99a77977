"""Online serving tests: HTTP surface, cross-request micro-batching,
patch payloads, error paths.  The server wraps eval/predict.Predictor —
per-sample outputs are independent of batch composition (no cross-sample
ops in the deterministic forward), so a coalesced score must equal the
same instance scored alone."""
import base64
import http.client
import json
import threading

import numpy as np
import pytest

from mmoe_multimodal_rec_tpu.data.decode import PATCH_SHAPE
from mmoe_multimodal_rec_tpu.eval.predict import Predictor
from mmoe_multimodal_rec_tpu.eval.server import PredictionServer
from mmoe_multimodal_rec_tpu.train import Trainer
from util import tiny_config, tiny_tokenizer

BATCH = 4


@pytest.fixture(scope="module")
def predictor():
    cfg = tiny_config("baseline")
    trainer = Trainer(cfg)
    return Predictor.from_state(cfg, trainer.state, batch_size=BATCH,
                                tokenizer=tiny_tokenizer(cfg))


@pytest.fixture()
def server(predictor):
    srv = PredictionServer(predictor, host="127.0.0.1", port=0,
                           max_wait_ms=2.0,
                           model_info={"variant": "baseline", "step": 0})
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


def _request(srv, method, path, body=None):
    conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=60)
    try:
        conn.request(method, path,
                     body=json.dumps(body) if body is not None else None,
                     headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        return resp.status, json.loads(resp.read())
    finally:
        conn.close()


def test_healthz(server):
    code, out = _request(server, "GET", "/healthz")
    assert code == 200
    assert out["status"] == "ok"
    assert out["batch_size"] == BATCH
    assert out["variant"] == "baseline"


def test_predict_matches_direct_and_chunks_over_batch(server, predictor):
    """6 instances through one request (> batch_size=4 -> two device
    batches); each score equals the instance scored alone."""
    users = [f"great product review number {i}" for i in range(6)]
    items = [f"item description text {i}" for i in range(6)]
    code, out = _request(server, "POST", "/v1/predict", {
        "instances": [{"user_text": u, "item_text": t}
                      for u, t in zip(users, items)]})
    assert code == 200
    preds = out["predictions"]
    assert len(preds) == 6
    for i in range(6):
        solo = predictor.predict([users[i]], [items[i]])
        np.testing.assert_allclose(preds[i]["prob_good"],
                                   float(solo["prob_good"][0]), atol=1e-5)
        np.testing.assert_allclose(preds[i]["prob_best"],
                                   float(solo["prob_best"][0]), atol=1e-5)
    code, stats = _request(server, "GET", "/varz")
    assert code == 200
    assert stats["instances"] >= 6
    assert stats["device_batches"] >= 2


def test_patch_payload(server, predictor):
    rng = np.random.default_rng(0)
    patch = rng.integers(0, 256, size=PATCH_SHAPE, dtype=np.uint8)
    b64 = base64.b64encode(patch.tobytes()).decode()
    code, out = _request(server, "POST", "/v1/predict", {
        "instances": [{"user_text": "u", "item_text": "i",
                       "patch_b64": b64}]})
    assert code == 200
    solo = predictor.predict(["u"], ["i"], patches=patch[None],
                             has_image=np.ones(1, np.int32))
    np.testing.assert_allclose(out["predictions"][0]["prob_good"],
                               float(solo["prob_good"][0]), atol=1e-5)


def test_concurrent_requests_coalesce(server, predictor):
    """Two racing single-instance requests both come back correct (and
    may share one device batch via the micro-batcher)."""
    results = {}

    def post(key, text):
        results[key] = _request(server, "POST", "/v1/predict", {
            "instances": [{"user_text": text, "item_text": "common item"}]})

    threads = [threading.Thread(target=post, args=(k, f"user text {k}"))
               for k in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for k in range(4):
        code, out = results[k]
        assert code == 200
        solo = predictor.predict([f"user text {k}"], ["common item"])
        np.testing.assert_allclose(out["predictions"][0]["prob_good"],
                                   float(solo["prob_good"][0]), atol=1e-5)


def test_error_paths(server):
    # malformed JSON
    conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=30)
    conn.request("POST", "/v1/predict", body="{not json",
                 headers={"Content-Type": "application/json"})
    assert conn.getresponse().status == 400
    conn.close()
    # missing instances
    code, out = _request(server, "POST", "/v1/predict", {"rows": []})
    assert code == 400 and "instances" in out["error"]
    # bad instance shape
    code, out = _request(server, "POST", "/v1/predict",
                         {"instances": [{"user_text": 3}]})
    assert code == 400
    # bad patch payload
    code, out = _request(server, "POST", "/v1/predict", {
        "instances": [{"user_text": "u", "item_text": "i",
                       "patch_b64": base64.b64encode(b"abc").decode()}]})
    assert code == 400 and "bytes" in out["error"]
    # unknown route
    code, _ = _request(server, "GET", "/nope")
    assert code == 404
    code, _ = _request(server, "POST", "/nope")
    assert code == 404


def test_home_variant_serving():
    """HoME predictor: BN running stats ride the variables; deterministic
    forward works through the server scoring path."""
    cfg = tiny_config("home")
    trainer = Trainer(cfg)
    pred = Predictor.from_state(cfg, trainer.state, batch_size=2,
                                tokenizer=tiny_tokenizer(cfg))
    assert "batch_stats" in pred._variables
    out = pred.predict(["nice product"], ["tent for camping"])
    assert 0.0 < float(out["prob_good"][0]) < 1.0
    assert 0.0 < float(out["prob_best"][0]) < 1.0
    # padding row discarded; single instance equals itself batched with a
    # second instance (per-sample independence at inference: BN uses
    # running stats, not batch stats)
    two = pred.predict(["nice product", "bad one"],
                       ["tent for camping", "bike"])
    np.testing.assert_allclose(float(two["prob_good"][0]),
                               float(out["prob_good"][0]), atol=1e-5)


def test_oversized_body_rejected(server):
    conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=30)
    conn.request("POST", "/v1/predict", body=b"x",
                 headers={"Content-Type": "application/json",
                          "Content-Length": str(1 << 31)})
    assert conn.getresponse().status == 413
    conn.close()


def test_bucketed_predictor_matches_across_buckets():
    """Bucket choice never changes scores (per-sample independence):
    1 instance via bucket 2 == same instance via the full bucket; the
    healthz/micro-batcher cap is the largest bucket."""
    cfg = tiny_config("baseline")
    trainer = Trainer(cfg)
    tok = tiny_tokenizer(cfg)
    bucketed = Predictor.from_state(cfg, trainer.state, tokenizer=tok,
                                    buckets=[2, 4])
    single = Predictor.from_state(cfg, trainer.state, tokenizer=tok,
                                  batch_size=4)
    assert bucketed.batch_size == 4
    a = bucketed.predict(["one review"], ["one item"])     # -> bucket 2
    b = single.predict(["one review"], ["one item"])       # -> bucket 4
    np.testing.assert_allclose(float(a["prob_good"][0]),
                               float(b["prob_good"][0]), atol=1e-5)
    c = bucketed.predict(["one review"] * 3, ["one item"] * 3)  # -> 4
    np.testing.assert_allclose(float(c["prob_good"][0]),
                               float(a["prob_good"][0]), atol=1e-5)
    bucketed.warmup()   # compiles both shapes without error


def test_explicit_batch_size_unioned_into_buckets():
    """--batch-size is a capacity promise: it joins the bucket set instead
    of being silently capped by buckets[-1]."""
    cfg = tiny_config("baseline")
    trainer = Trainer(cfg)
    pred = Predictor.from_state(cfg, trainer.state,
                                tokenizer=tiny_tokenizer(cfg),
                                batch_size=6, buckets=[2, 4])
    assert pred.buckets == [2, 4, 6]
    assert pred.batch_size == 6
    out = pred.predict(["r"] * 5, ["i"] * 5)   # > 4 -> the 6 bucket
    assert len(out["prob_good"]) == 5
