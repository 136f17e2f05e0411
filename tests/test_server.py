"""OpenAI-compatible server tests (the role of the reference's
tests/entrypoints/ with RemoteOpenAIServer): a real HTTP server over a tiny
engine, exercised with stdlib urllib."""

import json
import urllib.request

import jax.numpy as jnp
import numpy as np
import pytest

from kvcompress_tpu.engine.llm_engine import LLMEngine
from kvcompress_tpu.entrypoints.openai.api_server import OpenAIServer
from kvcompress_tpu.models.llama import init_llama_params

from test_engine import tiny_cfg, VOCAB


class FakeTokenizer:
    eos_token_id = 0
    chat_template = None

    def encode(self, text):
        return [(ord(c) % (VOCAB - 1)) + 1 for c in text][:32]

    def decode(self, ids, skip_special_tokens=True):
        return "".join(chr(97 + (i % 26)) for i in ids)


@pytest.fixture(scope="module")
def server():
    cfg = tiny_cfg()
    params = init_llama_params(cfg.model, seed=0, dtype=jnp.float32)
    engine = LLMEngine(cfg, params, num_blocks=512, attn_impl="xla",
                       tokenizer=FakeTokenizer())
    srv = OpenAIServer(engine, model_name="tiny-llama")
    httpd = srv.serve(host="127.0.0.1", port=0, background=True)
    port = httpd.server_address[1]
    yield f"http://127.0.0.1:{port}", srv
    srv.close()


def _post(url, path, body):
    req = urllib.request.Request(
        url + path, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req) as r:
        return json.loads(r.read())


def _get(url, path):
    with urllib.request.urlopen(url + path) as r:
        data = r.read()
        try:
            return json.loads(data)
        except json.JSONDecodeError:
            return data.decode()


def test_health_and_models(server):
    url, _ = server
    assert _get(url, "/health")["status"] == "ok"
    models = _get(url, "/v1/models")
    assert models["data"][0]["id"] == "tiny-llama"


def test_completions_with_kvc_fields(server):
    url, _ = server
    out = _post(url, "/v1/completions", {
        "model": "tiny-llama",
        "prompt": "hello world this is a test prompt",
        "max_tokens": 6,
        "temperature": 0.0,
        "ignore_eos": True,
        "max_cache_tokens": 8,
        "protected_window_size": 4,
        "compress_once": True,
    })
    assert out["object"] == "text_completion"
    assert out["usage"]["completion_tokens"] == 6
    assert isinstance(out["choices"][0]["text"], str)
    assert out["choices"][0]["finish_reason"] == "length"


def test_chat_completions(server):
    url, _ = server
    out = _post(url, "/v1/chat/completions", {
        "model": "tiny-llama",
        "messages": [{"role": "user", "content": "hi there"}],
        "max_tokens": 4,
        "temperature": 0.0,
        "ignore_eos": True,
    })
    assert out["object"] == "chat.completion"
    assert out["choices"][0]["message"]["role"] == "assistant"


def test_concurrent_requests(server):
    import threading
    url, _ = server
    results = []

    def go(i):
        out = _post(url, "/v1/completions", {
            "prompt": f"prompt number {i} padded with text",
            "max_tokens": 4, "temperature": 0.0, "ignore_eos": True})
        results.append(out["usage"]["completion_tokens"])

    threads = [threading.Thread(target=go, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert results == [4] * 6


def test_tokenize_roundtrip_and_metrics(server):
    url, _ = server
    toks = _post(url, "/tokenize", {"prompt": "abc"})
    assert toks["count"] == 3
    det = _post(url, "/detokenize", {"tokens": toks["tokens"]})
    assert isinstance(det["prompt"], str)
    metrics = _get(url, "/metrics")
    assert "kvc_requests_added_total" in metrics


def test_bad_request(server):
    url, _ = server
    req = urllib.request.Request(
        url + "/v1/completions", data=b"not json",
        headers={"Content-Type": "application/json"})
    try:
        urllib.request.urlopen(req)
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_async_engine_error_propagation():
    """A crash in the background engine loop must surface to callers
    instead of hanging them (reference AsyncLLMEngine dead-engine
    propagation)."""
    import pytest as _pytest
    from kvcompress_tpu.engine.async_engine import AsyncEngine, EngineDeadError

    class BoomEngine:
        tokenizer = None

        def add_request(self, *a, **k):
            return "r0"

        def has_unfinished_requests(self):
            return True

        def step(self):
            raise RuntimeError("boom")

    async_eng = AsyncEngine(BoomEngine())
    try:
        # the loop may crash before or after this submit lands
        stream = async_eng.submit(None, [1, 2, 3], None)
        stream.done.wait(timeout=5)
    except EngineDeadError:
        pass
    assert async_eng.errored is not None
    with _pytest.raises(EngineDeadError):
        async_eng.generate(None, [1, 2, 3], None)
    async_eng.shutdown()


def test_sse_streaming_completion(server):
    """stream=true yields SSE chunks ending in [DONE] whose concatenated
    text equals the non-streaming completion."""
    import http.client
    import json as _json
    from urllib.parse import urlparse

    url, _srv = server
    parsed = urlparse(url)
    host, port = parsed.hostname, parsed.port
    body = _json.dumps({"prompt": [5, 6, 7, 8], "max_tokens": 6,
                        "temperature": 0.0, "ignore_eos": True})
    conn = http.client.HTTPConnection(host, port, timeout=60)
    conn.request("POST", "/v1/completions", body,
                 {"Content-Type": "application/json"})
    ref = _json.loads(conn.getresponse().read())
    ref_text = ref["choices"][0]["text"]

    body = _json.dumps({"prompt": [5, 6, 7, 8], "max_tokens": 6,
                        "temperature": 0.0, "ignore_eos": True,
                        "stream": True})
    conn = http.client.HTTPConnection(host, port, timeout=60)
    conn.request("POST", "/v1/completions", body,
                 {"Content-Type": "application/json"})
    resp = conn.getresponse()
    assert resp.getheader("Content-Type").startswith("text/event-stream")
    raw = resp.read().decode()
    chunks = [l[len("data: "):] for l in raw.splitlines()
              if l.startswith("data: ")]
    assert chunks[-1] == "[DONE]"
    text = "".join(_json.loads(c)["choices"][0]["text"]
                   for c in chunks[:-1])
    assert text == ref_text


def test_legacy_generate_endpoint(server):
    """Legacy /generate (reference vllm/entrypoints/api_server.py:40-88):
    returns {"text": [prompt + completion]}; streaming yields
    NUL-terminated JSON snapshots."""
    url, _ = server
    out = _post(url, "/generate", {
        "prompt": "hello world", "max_tokens": 5,
        "temperature": 0.0, "ignore_eos": True})
    assert isinstance(out["text"], list) and len(out["text"]) == 1
    assert out["text"][0].startswith("hello world")
    assert len(out["text"][0]) > len("hello world")

    req = urllib.request.Request(
        url + "/generate",
        data=json.dumps({"prompt": "stream me", "stream": True,
                         "max_tokens": 4, "temperature": 0.0,
                         "ignore_eos": True}).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req) as r:
        chunks = r.read().split(b"\0")
    snaps = [json.loads(c) for c in chunks if c]
    assert snaps, "no streamed snapshots"
    assert all(s["text"][0].startswith("stream me") for s in snaps)
    # snapshots are monotone growing full texts
    lens = [len(s["text"][0]) for s in snaps]
    assert lens == sorted(lens)


def test_streaming_bad_request_emits_error_chunk(server):
    """A request that fails add_request in the loop thread (over-length
    prompt) must not yield HTTP 200 with a silently empty stream: the
    legacy /generate stream ends with an {"error": ...} chunk, and the
    SSE path emits an error event before [DONE]."""
    url, _ = server
    long_prompt = list(range(1, 101))  # > max_model_len=64
    req = urllib.request.Request(
        url + "/generate",
        data=json.dumps({"prompt": long_prompt, "stream": True,
                         "max_tokens": 4}).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=30) as r:
        chunks = [json.loads(c) for c in r.read().split(b"\0") if c]
    assert chunks and "error" in chunks[-1], chunks

    req = urllib.request.Request(
        url + "/v1/completions",
        data=json.dumps({"prompt": long_prompt, "stream": True,
                         "max_tokens": 4}).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=30) as r:
        raw = r.read().decode()
    datas = [l[len("data: "):] for l in raw.splitlines()
             if l.startswith("data: ")]
    assert datas[-1] == "[DONE]"
    assert any("error" in json.loads(c) for c in datas[:-1]), datas


def test_chat_with_image_matches_hf(tmp_path):
    """Image content parts in /v1/chat/completions (reference
    entrypoints/chat_utils.py parse_image): a base64 data-URL image runs
    the checkpoint's HF image processor + vision tower server-side, and
    the chat output equals HF LlavaForConditionalGeneration.generate on
    the identical pixel values."""
    import base64
    import io
    import os

    transformers = pytest.importorskip("transformers")
    import torch
    from PIL import Image
    from safetensors.torch import save_file
    from tokenizers import Tokenizer, models as tmodels, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    from tests.test_multimodal import tiny_llava, IMG_TOK

    torch.manual_seed(90)
    m, cfg = tiny_llava()
    d = str(tmp_path / "llava_srv_ck")
    os.makedirs(d)
    hf_cfg = cfg.to_dict()
    hf_cfg["architectures"] = ["LlavaForConditionalGeneration"]
    with open(f"{d}/config.json", "w") as f:
        json.dump(hf_cfg, f)
    save_file({k: v.clone().contiguous()
               for k, v in m.state_dict().items()},
              f"{d}/model.safetensors")
    proc = transformers.CLIPImageProcessor(
        size={"shortest_edge": 28}, crop_size={"height": 28, "width": 28})
    proc.save_pretrained(d)
    vocab = {f"w{i:03d}": i for i in range(128)}
    for j, w in enumerate(["hello", "what", "is", "this"]):
        del vocab[f"w{j + 20:03d}"]
        vocab[w] = j + 20
    del vocab[f"w{IMG_TOK:03d}"]
    vocab["<image>"] = IMG_TOK
    t = Tokenizer(tmodels.WordLevel(vocab, unk_token="w001"))
    t.pre_tokenizer = pre_tokenizers.WhitespaceSplit()
    fast = PreTrainedTokenizerFast(tokenizer_object=t, unk_token="w001",
                                   pad_token="w000")
    fast.save_pretrained(d)

    rng = np.random.default_rng(91)
    img = Image.fromarray(
        rng.integers(0, 255, size=(28, 28, 3), dtype=np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    data_url = ("data:image/png;base64,"
                + base64.b64encode(buf.getvalue()).decode())

    from kvcompress_tpu.entrypoints.llm import LLM
    llm = LLM(model=d, dtype="float32", num_blocks=256, max_num_seqs=2,
              max_model_len=64, enable_kvcompress=True)
    srv = OpenAIServer(llm.llm_engine, model_name="tiny-llava", llm=llm)
    httpd = srv.serve(host="127.0.0.1", port=0, background=True)
    url = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        body = {
            "model": "tiny-llava",
            "messages": [{"role": "user", "content": [
                {"type": "text", "text": "hello"},
                {"type": "image_url", "image_url": {"url": data_url}},
                {"type": "text", "text": "what is this"},
            ]}],
            "max_tokens": 5, "temperature": 0.0, "ignore_eos": True,
        }
        resp = _post(url, "/v1/chat/completions", body)
        got = resp["choices"][0]["message"]["content"]

        # HF reference on the SAME template text + processed pixels.
        # The server's fallback chat template appends the generation
        # prompt "\nassistant:" (add_generation_prompt=True semantics,
        # reference entrypoints/chat_utils.py apply_chat_template), so
        # the reference text must include it — "assistant:" maps to the
        # unk token in this WordLevel vocab, same as the server sees.
        text = "user: hello <image> what is this\nassistant:"
        ids = fast.encode(text)
        expanded = []
        for tok in ids:
            expanded.extend([IMG_TOK] * 4 if tok == IMG_TOK else [tok])
        px = proc(images=[img], return_tensors="pt")["pixel_values"]
        with torch.no_grad():
            hf_out = m.generate(input_ids=torch.tensor([expanded]),
                                pixel_values=px, max_new_tokens=5,
                                do_sample=False)
        ref_ids = hf_out[0, len(expanded):].tolist()
        ref = fast.decode(ref_ids, skip_special_tokens=True)
        assert got == ref, (got, ref)
    finally:
        srv.close()
