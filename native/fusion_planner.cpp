// Native gate-layer scheduler for the fused Pallas kernel.
//
// C++ implementation of rocquantum_tpu.ops.relabel.plan_full_layer — the
// dependency-aware greedy that packs 1q/CNOT gates into multi-pair kernel
// passes. The TPU-native counterpart of the reference's host-side C++ gate
// scheduler (GateFusion.cpp:89-156): trace-time work stays native; the
// Python implementation remains as fallback and as the differential-test
// oracle (plans must match item-for-item).
//
// Scheduling model: a pass covers gates whose qubits are all < reach (the
// roll window) or members of the pass's pair-bit set (block pairing, up to
// max_pairs bits >= reach). Each pass seeds its pair set with the head
// pending gate's out-of-window bits (progress guarantee), then greedily
// adds the candidate bit that schedules the most extra gates (ascending
// order, strict improvement only).
//
// Scheduling constraints are per-gate ANCHOR qubits — the qubits that must
// fit the window or the pair set. Diagonals anchor nothing (bit values
// grid-resolve); a CNOT with an out-of-window control anchors only its
// target. Dependency blocking always uses the full support (q0/q1).
//
// ABI (ctypes):
//   rocq_plan_layer_mp(n, reach, max_pairs, num_gates,
//                      q0[num_gates], q1[num_gates] /* -1 for 1q */,
//                      a0[num_gates], a1[num_gates] /* anchors, -1 none */,
//                      out[capacity]) -> number of int32 written, or
//                      -1 capacity exceeded, -3 bad input (including a
//                      gate with more out-of-window anchors than
//                      max_pairs)
// Output encoding, repeated records:
//   [1, npairs, pairs..., count, idx...]   — one kernel pass

#include <algorithm>
#include <cstdint>
#include <vector>

namespace {

struct Gate {
  int32_t q0;
  int32_t q1;  // -1 for 1q
  int32_t a0;  // anchored qubits (must fit window/pairs); -1 = none
  int32_t a1;
};

// one list-scheduling sweep: gates whose qubits are unblocked and whose
// positions fit {q < reach} ∪ pairs
std::vector<int> scan(int n, int reach, const std::vector<Gate>& gates,
                      const std::vector<int>& pending,
                      const std::vector<char>& pair_set) {
  std::vector<int> taken;
  std::vector<char> blocked(n, 0);
  for (int i : pending) {
    const Gate& g = gates[i];
    bool is_blocked = blocked[g.q0] || (g.q1 >= 0 && blocked[g.q1]);
    if (is_blocked) {
      blocked[g.q0] = 1;
      if (g.q1 >= 0) blocked[g.q1] = 1;
      continue;
    }
    auto fits = [&](int q) { return q < 0 || q < reach || pair_set[q]; };
    if (fits(g.a0) && fits(g.a1)) {
      taken.push_back(i);
    } else {
      blocked[g.q0] = 1;
      if (g.q1 >= 0) blocked[g.q1] = 1;
    }
  }
  return taken;
}

}  // namespace

extern "C" int rocq_plan_layer_mp(int n, int reach, int max_pairs,
                                  int num_gates, const int32_t* q0,
                                  const int32_t* q1, const int32_t* a0,
                                  const int32_t* a1, int32_t* out,
                                  int capacity) {
  if (n <= 0 || reach <= 0 || num_gates < 0 || max_pairs < 0) return -3;
  std::vector<Gate> gates(num_gates);
  for (int i = 0; i < num_gates; ++i) {
    if (q0[i] < 0 || q0[i] >= n || q1[i] >= n || a0[i] >= n || a1[i] >= n)
      return -3;
    gates[i] = Gate{q0[i], q1[i], a0[i], a1[i]};
    int high = (a0[i] >= reach) + (a1[i] >= reach);
    if (high > max_pairs) return -3;
  }

  std::vector<int> pending(num_gates);
  for (int i = 0; i < num_gates; ++i) pending[i] = i;

  int w = 0;
  auto emit = [&](int v) -> bool {
    if (w >= capacity) return false;
    out[w++] = v;
    return true;
  };

  while (!pending.empty()) {
    // seed: head gate's out-of-window bits
    std::vector<char> pair_set(n, 0);
    int npairs = 0;
    const Gate& g0 = gates[pending[0]];
    for (int q : {g0.a0, g0.a1}) {
      if (q >= reach && !pair_set[q]) {
        pair_set[q] = 1;
        ++npairs;
      }
    }
    std::vector<int> take = scan(n, reach, gates, pending, pair_set);
    while (npairs < max_pairs) {
      // candidates: out-of-window bits of pending gates, ascending
      std::vector<int> cands;
      for (int i : pending) {
        const Gate& g = gates[i];
        for (int q : {g.a0, g.a1}) {
          if (q >= reach && !pair_set[q]) cands.push_back(q);
        }
      }
      std::sort(cands.begin(), cands.end());
      cands.erase(std::unique(cands.begin(), cands.end()), cands.end());
      int best = -1;
      std::vector<int> best_take = take;
      for (int p : cands) {
        pair_set[p] = 1;
        std::vector<int> t = scan(n, reach, gates, pending, pair_set);
        pair_set[p] = 0;
        if (t.size() > best_take.size()) {
          best = p;
          best_take = std::move(t);
        }
      }
      if (best < 0) break;
      pair_set[best] = 1;
      ++npairs;
      take = std::move(best_take);
    }
    if (take.empty()) return -3;  // cannot happen: the seed covers the head

    // pair bits actually used by taken gates, ascending
    std::vector<char> used(n, 0);
    for (int i : take) {
      const Gate& g = gates[i];
      for (int q : {g.a0, g.a1})
        if (q >= reach) used[q] = 1;
    }
    std::vector<int> pairs;
    for (int q = reach; q < n; ++q)
      if (used[q]) pairs.push_back(q);

    if (!emit(1) || !emit((int)pairs.size())) return -1;
    for (int p : pairs)
      if (!emit(p)) return -1;
    if (!emit((int)take.size())) return -1;
    for (int i : take)
      if (!emit(i)) return -1;

    std::vector<char> taken_set(num_gates, 0);
    for (int i : take) taken_set[i] = 1;
    std::vector<int> next;
    next.reserve(pending.size());
    for (int i : pending)
      if (!taken_set[i]) next.push_back(i);
    pending = std::move(next);
  }
  return w;
}
