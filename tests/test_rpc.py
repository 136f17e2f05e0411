"""Decoupled RPC front-end (entrypoints/openai/rpc.py): the engine in its
own spawned process behind a unix socket, the OpenAI server talking to it
through RPCEngineClient (reference vllm/entrypoints/openai/rpc/ zmq
client/server + api_server.py:97-130 RPC mode)."""

import json
import os

import numpy as np
import pytest
import torch

from kvcompress_tpu.sampling_params import SamplingParams


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    import transformers
    from safetensors.torch import save_file
    from tokenizers import Tokenizer, models as tmodels, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    torch.manual_seed(7)
    cfg = transformers.LlamaConfig(
        architectures=["LlamaForCausalLM"], vocab_size=128,
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128)
    m = transformers.LlamaForCausalLM(cfg).eval()
    d = str(tmp_path_factory.mktemp("rpc_ck"))
    save_file({k: v.clone().contiguous() for k, v in m.state_dict().items()},
              f"{d}/model.safetensors")
    with open(f"{d}/config.json", "w") as f:
        json.dump(cfg.to_dict(), f)
    vocab = {f"w{i:03d}": i for i in range(128)}
    t = Tokenizer(tmodels.WordLevel(vocab, unk_token="w001"))
    t.pre_tokenizer = pre_tokenizers.WhitespaceSplit()
    PreTrainedTokenizerFast(tokenizer_object=t, unk_token="w001",
                            pad_token="w000").save_pretrained(d)
    return d


LLM_KW = dict(dtype="float32", num_blocks=256, max_num_seqs=2,
              max_model_len=64, enable_kvcompress=True)


@pytest.fixture(scope="module")
def rpc_client(ckpt):
    # the spawned engine process does not run this suite's conftest:
    # pin its backend/cache through the inherited environment
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault("KVC_COMPILATION_CACHE", "/tmp/kvc_rpc_test")
    from kvcompress_tpu.entrypoints.openai.rpc import (
        RPCEngineClient, spawn_engine_process)
    proc, sock = spawn_engine_process(dict(model=ckpt, **LLM_KW))
    client = RPCEngineClient(sock, connect_timeout=300.0)
    yield client
    client.shutdown()
    proc.join(timeout=15)
    if proc.is_alive():
        proc.terminate()


@pytest.mark.full  # builds a SECOND engine in-process (~4 min on 1 core)
def test_rpc_generate_matches_in_process(ckpt, rpc_client):
    from kvcompress_tpu.entrypoints.llm import LLM
    ids = list(range(5, 20))
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    out = rpc_client.generate(None, ids, sp)
    assert out.finished and len(out.outputs[0].token_ids) == 8
    llm = LLM(model=ckpt, **LLM_KW)
    ref = llm.generate(prompt_token_ids=[ids], sampling_params=sp)[0]
    assert out.outputs[0].token_ids == ref.outputs[0].token_ids
    assert rpc_client.health() is None


def test_rpc_streaming_monotone(rpc_client):
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    stream = rpc_client.submit(None, list(range(3, 12)), sp)
    lens = [len(o.outputs[0].token_ids) for o in stream]
    assert lens and lens[-1] == 6
    assert lens == sorted(lens)
    assert stream.finished is not None


def test_rpc_metrics_and_embed(rpc_client):
    text = rpc_client.metrics_text()
    assert "kvc" in text or "prompt_tokens" in text or "# HELP" in text
    vec = rpc_client.embed([1, 2, 3])
    assert isinstance(vec, list) and len(vec) > 0


def test_rpc_abort_terminates_stream(rpc_client):
    sp = SamplingParams(temperature=0.0, max_tokens=512, ignore_eos=True)
    stream = rpc_client.submit(None, list(range(4, 14)), sp)
    rpc_client.abort(stream.request_id)
    stream.done.wait(timeout=60)
    assert stream.done.is_set()


def test_rpc_bad_request_errors_cleanly(rpc_client):
    sp = SamplingParams(temperature=0.0, max_tokens=4)
    stream = rpc_client.submit(None, list(range(500)), sp)  # over-length
    stream.done.wait(timeout=60)
    assert stream.error is not None


def test_openai_server_over_rpc(ckpt, rpc_client):
    """The HTTP surface served from the RPC client: completions with
    token-id prompts, /metrics proxying, /v1/embeddings."""
    from transformers import AutoTokenizer
    from kvcompress_tpu.entrypoints.openai.api_server import OpenAIServer
    tok = AutoTokenizer.from_pretrained(ckpt)
    srv = OpenAIServer(rpc=rpc_client, tokenizer=tok, model_name="rpc-m")
    code, body = srv.handle("POST", "/v1/completions", {
        "prompt": list(range(5, 15)), "max_tokens": 4,
        "temperature": 0.0, "ignore_eos": True})
    assert code == 200, body
    assert body["choices"][0]["text"]
    code, body = srv.handle("GET", "/metrics", None)
    assert code == 200
    code, body = srv.handle("POST", "/v1/embeddings",
                            {"input": [[1, 2, 3]]})
    assert code == 200 and body["data"][0]["embedding"]
