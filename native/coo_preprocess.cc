// Native COO preprocessing for the sharded embedding lookup.
//
// C++ rebuild of the hot host loop the reference delegates to
// jax-tpu-embedding's native `preprocess_sparse_dense_matmul_input`
// (keras_rs/src/layers/embedding/jax/embedding_utils.py:144-217): per-batch
// translation of feature id matrices into per-(source device, destination
// shard) COO buckets plus the dedup structures for the backward pass.
// Bit-for-bit parity with the numpy reference implementation in
// keras_rs_tpu/layers/embedding/preprocessing.py (entry order, drop policy,
// sorted dedup) is covered by tests/test_native_preprocess.py.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libcoo_preprocess.so \
//            coo_preprocess.cc
//
// Single pass over the entries; no allocations proportional to vocab.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>

extern "C" {

// Returns 0 on success.
int coo_preprocess(
    // Per-feature inputs.
    int64_t num_features,
    const int64_t** ids,         // [F] -> [B * L_f] feature id matrices
    const float** weights,       // [F] -> [B * L_f] or nullptr
    const int64_t* valences,     // [F] L_f
    const int64_t* vocab_sizes,  // [F] table vocab of the feature
    const int64_t* local_offsets,// [F] table local slot offset
    const int64_t* rotations,    // [F] table shard rotation
    const int32_t* combiners,    // [F] 0 = sum, 1 = mean, 2 = sqrtn
    // Stack configuration.
    int64_t B,     // global batch
    int64_t D,     // shards
    int64_t C,     // per-bucket capacity
    int64_t U,     // per-shard unique capacity (incl. sink slot)
    int64_t sink,  // sink slot id
    // Outputs (pre-allocated and pre-filled by the caller: send_slots and
    // unique_slots with `sink`, entry_unique with U (the drop sentinel),
    // send_segs/gains with zeros, divisors with ones).
    int32_t* send_slots,    // [D, D, C]
    int32_t* send_segs,     // [D, D, C]
    float* send_gains,      // [D, D, C]
    int32_t* unique_slots,  // [D, U]
    int32_t* entry_unique,  // [D, D * C]
    float* divisors,        // [D, S_l], S_l = F * (B / D)
    // Stats out: [max_ids_per_bucket, max_unique_per_shard, dropped].
    int64_t* stats) {
  const int64_t Bl = B / D;
  const int64_t S_l = num_features * Bl;

  // Per-bucket cursors; bucket (d, s) index = d * D + s.
  std::vector<int64_t> counts(static_cast<size_t>(D) * D, 0);
  int64_t dropped = 0;

  // --- bucket fill (encounter order == numpy lexsort(seg, s, d) order) ---
  // Segment ids are SAMPLE-major: seg = (b % Bl) * F + f, so the lookup's
  // activations reshape straight to [B, F, dim]. Within a bucket the numpy
  // reference's lexsort therefore orders entries by (sample, feature,
  // original l) — the loop nest below encounters them in exactly that
  // order (sample outer, feature inner).
  const int64_t F = num_features;
  for (int64_t b = 0; b < B; ++b) {
    const int64_t d = b / Bl;
    const int64_t base_seg = (b % Bl) * F;
    for (int64_t f = 0; f < F; ++f) {
      const int64_t L = valences[f];
      const int64_t vocab = vocab_sizes[f];
      const int64_t offset = local_offsets[f];
      const int64_t rot = rotations[f];
      const int32_t combiner = combiners[f];
      const int64_t* fid = ids[f];
      const float* fw = weights[f];
      const int64_t seg = base_seg + f;
      float seg_accum = 0.0f;
      for (int64_t l = 0; l < L; ++l) {
        const int64_t r = fid[b * L + l];
        const float g = fw ? fw[b * L + l] : 1.0f;
        if (g == 0.0f || r < 0 || r >= vocab) continue;
        const int64_t s = (r + rot) % D;  // rotated MOD sharding
        const int64_t bucket = d * D + s;
        const int64_t rank = counts[bucket]++;
        if (rank >= C) {
          ++dropped;
        } else {
          const int64_t at = (d * D + s) * C + rank;
          send_slots[at] = static_cast<int32_t>(offset + r / D);
          send_segs[at] = static_cast<int32_t>(seg);
          send_gains[at] = g;
        }
        if (combiner == 1) {
          seg_accum += g;
        } else if (combiner == 2) {
          seg_accum += g * g;
        }
      }
      if (combiner != 0) {
        float div = (combiner == 2) ? std::sqrt(seg_accum) : seg_accum;
        if (div == 0.0f) div = 1.0f;
        divisors[d * S_l + seg] = div;
      }
    }
  }

  int64_t max_ids = 0;
  for (const int64_t c : counts) max_ids = std::max(max_ids, c);

  // --- per-shard dedup (sorted uniques, numpy.unique parity) -------------
  int64_t max_unique = 0;
  std::vector<int32_t> slots_buf;
  slots_buf.reserve(static_cast<size_t>(D) * C);
  for (int64_t e = 0; e < D; ++e) {
    slots_buf.clear();
    // Received layout on shard e: concat over src d of bucket (d, e).
    for (int64_t d = 0; d < D; ++d) {
      const int64_t base = (d * D + e) * C;
      const int64_t n = std::min<int64_t>(counts[d * D + e], C);
      for (int64_t c = 0; c < n; ++c) {
        slots_buf.push_back(send_slots[base + c]);
      }
    }
    std::vector<int32_t> uniq(slots_buf);
    std::sort(uniq.begin(), uniq.end());
    uniq.erase(std::unique(uniq.begin(), uniq.end()), uniq.end());
    max_unique = std::max<int64_t>(max_unique, uniq.size());
    const int64_t n_keep =
        std::min<int64_t>(static_cast<int64_t>(uniq.size()), U - 1);
    for (int64_t i = 0; i < n_keep; ++i) {
      unique_slots[e * U + i] = uniq[i];
    }
    // entry -> unique index mapping for real entries.
    int64_t entry = 0;
    for (int64_t d = 0; d < D; ++d) {
      const int64_t n = std::min<int64_t>(counts[d * D + e], C);
      const int64_t base = (d * D + e) * C;
      for (int64_t c = 0; c < n; ++c, ++entry) {
        const int32_t slot = send_slots[base + c];
        const int64_t pos =
            std::lower_bound(uniq.begin(), uniq.end(), slot) - uniq.begin();
        // Unique-capacity overflow maps to the drop sentinel U (one
        // past the valid range; the backward segment-sum drops it).
        entry_unique[e * D * C + d * C + c] =
            static_cast<int32_t>(pos < n_keep ? pos : U);
      }
    }
  }

  stats[0] = max_ids;
  stats[1] = max_unique;
  stats[2] = dropped + std::max<int64_t>(0, max_unique - (U - 1));
  return 0;
}

}  // extern "C"
