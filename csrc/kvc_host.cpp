// Host-side hot-loop ops for the kvcompress-tpu engine.
//
// The engine's device programs hand back a [k, S] token matrix once per
// multi-step burst; accepting those tokens (EOS / stop-token / budget
// checks per sequence) and building speculative n-gram proposals are the
// only per-token host work on the serving path. These are the native
// equivalents of what the reference keeps on-GPU or in C++-backed torch
// ops (stop handling in vllm/engine/output_processor/, ngram proposal in
// vllm/spec_decode/ngram_worker.py).
//
// Build: g++ -O3 -shared -fPIC -o libkvc_host.so kvc_host.cpp
// (done lazily by kvcompress_tpu/utils/host_ops.py).

#include <cstdint>
#include <cstring>

extern "C" {

// Scan the [k, S] burst token matrix for per-sequence stopping conditions.
//
// tokens:        row-major [k, S]
// eos_ids:       shared EOS set (n_eos entries)
// stop_ids_flat: per-seq extra stop-token ids, concatenated;
// stop_offsets:  [S+1] prefix offsets into stop_ids_flat
// ignore_eos:    [S] 0/1
// budget:        [S] max tokens acceptable this burst (remaining max_tokens)
// min_left:      [S] tokens still required before EOS/stop may fire
// active:        [S] 0/1 - inactive slots accept 0 tokens
//
// Outputs: accept[s] = number of leading tokens of column s to append;
// reason[s] = 0 none, 1 stop token (eos or per-seq), 2 length budget.
void scan_stops(const int32_t* tokens, int k, int S,
                const int32_t* eos_ids, int n_eos,
                const int32_t* stop_ids_flat, const int32_t* stop_offsets,
                const uint8_t* ignore_eos, const int32_t* budget,
                const int32_t* min_left, const uint8_t* active,
                int32_t* accept, int32_t* reason) {
  for (int s = 0; s < S; ++s) {
    accept[s] = 0;
    reason[s] = 0;
    if (!active[s]) continue;
    const int32_t* my_stops = stop_ids_flat + stop_offsets[s];
    const int n_my = stop_offsets[s + 1] - stop_offsets[s];
    for (int t = 0; t < k; ++t) {
      const int32_t tok = tokens[t * S + s];
      accept[s] = t + 1;
      const bool past_min = (t + 1) >= min_left[s];
      if (past_min) {
        bool hit = false;
        if (!ignore_eos[s]) {
          for (int e = 0; e < n_eos; ++e)
            if (eos_ids[e] == tok) { hit = true; break; }
        }
        if (!hit) {
          for (int e = 0; e < n_my; ++e)
            if (my_stops[e] == tok) { hit = true; break; }
        }
        if (hit) { reason[s] = 1; break; }
      }
      if (t + 1 >= budget[s]) { reason[s] = 2; break; }
    }
  }
}

// Longest-suffix n-gram proposer (reference vllm/spec_decode/ngram_worker).
//
// ctx: token history (prompt + generated), length n. Searches for the most
// recent earlier occurrence of the longest matching suffix of length in
// [min_gram, max_gram]; proposes up to k tokens that followed it.
// Returns the number of proposed tokens written to out (0 = no match).
int ngram_propose(const int32_t* ctx, int n, int min_gram, int max_gram,
                  int k, int32_t* out) {
  if (n < min_gram + 1) return 0;
  for (int g = max_gram; g >= min_gram; --g) {
    if (g >= n) continue;
    const int32_t* suffix = ctx + n - g;
    // most recent earlier occurrence
    for (int start = n - g - 1; start >= 0; --start) {
      if (memcmp(ctx + start, suffix, sizeof(int32_t) * g) == 0) {
        int copied = 0;
        for (int j = start + g; j < n - g && copied < k; ++j, ++copied)
          out[copied] = ctx[j];
        if (copied > 0) return copied;
        break;  // match is flush against the suffix; try shorter gram
      }
    }
  }
  return 0;
}

// Batched token-occurrence histogram update (penalties bookkeeping when
// rebuilding a decode carry): counts[s, tokens[i]] += 1 per sequence.
void count_tokens(const int32_t* token_lists, const int32_t* offsets,
                  int S, int vocab, int32_t* counts) {
  for (int s = 0; s < S; ++s) {
    for (int i = offsets[s]; i < offsets[s + 1]; ++i) {
      const int32_t t = token_lists[i];
      if (t >= 0 && t < vocab) counts[(int64_t)s * vocab + t] += 1;
    }
  }
}

}  // extern "C"
