// Native gate-layer scheduler for the fused Pallas kernel.
//
// C++ implementation of rocquantum_tpu.ops.relabel.plan_full_layer — the
// dependency-aware greedy that packs 1q/CNOT gates into kernel passes plus
// index-bit rotations. The TPU-native counterpart of the reference's
// host-side C++ gate scheduler (GateFusion.cpp:89-156): trace-time work
// stays native; the Python implementation remains as fallback and as the
// differential-test oracle (plans must match item-for-item).
//
// ABI (ctypes):
//   rocq_plan_layer(n, reach, pair_ok, allow_rotations, num_gates,
//                   q0[num_gates], q1[num_gates] /* -1 for 1q */,
//                   out[capacity]) -> number of int32 written, or
//                   -1 capacity exceeded, -2 unschedulable w/o rotations,
//                   -3 bad input
// Output encoding, repeated records:
//   [0, shift]                 — rotation of bits [ROT_LO, n) down by shift
//   [1, pair, count, idx...]   — kernel pass (pair == -1 when unused)

#include <algorithm>
#include <cstdint>
#include <vector>

namespace {

constexpr int ROT_LO = 7;

struct Gate {
  int32_t q0;
  int32_t q1;  // -1 for 1q
};

struct Scheduler {
  int n;
  int reach;
  int size;
  int rot = 0;

  int pos(int q) const {
    if (q < ROT_LO) return q;
    int m = (q - ROT_LO - rot) % size;
    if (m < 0) m += size;
    return ROT_LO + m;
  }
};

// one list-scheduling sweep: gates whose qubits are unblocked and whose
// positions fit {pos < reach} ∪ {pair}
std::vector<int> scan(const Scheduler& s, const std::vector<Gate>& gates,
                      const std::vector<int>& pending, int pair) {
  std::vector<int> taken;
  std::vector<char> blocked(s.n, 0);
  for (int i : pending) {
    const Gate& g = gates[i];
    bool is_blocked = blocked[g.q0] || (g.q1 >= 0 && blocked[g.q1]);
    if (is_blocked) {
      blocked[g.q0] = 1;
      if (g.q1 >= 0) blocked[g.q1] = 1;
      continue;
    }
    auto fits = [&](int q) {
      int p = s.pos(q);
      return p < s.reach || p == pair;
    };
    if (fits(g.q0) && (g.q1 < 0 || fits(g.q1))) {
      taken.push_back(i);
    } else {
      blocked[g.q0] = 1;
      if (g.q1 >= 0) blocked[g.q1] = 1;
    }
  }
  return taken;
}

}  // namespace

extern "C" int rocq_plan_layer(int n, int reach, int pair_ok,
                               int allow_rotations, int num_gates,
                               const int32_t* q0, const int32_t* q1,
                               int32_t* out, int capacity) {
  if (n <= ROT_LO || reach <= 0 || num_gates < 0) return -3;
  std::vector<Gate> gates(num_gates);
  for (int i = 0; i < num_gates; ++i) {
    if (q0[i] < 0 || q0[i] >= n || q1[i] >= n) return -3;
    gates[i] = Gate{q0[i], q1[i]};
  }
  Scheduler s{n, reach, n - ROT_LO};

  std::vector<int> pending(num_gates);
  for (int i = 0; i < num_gates; ++i) pending[i] = i;

  int w = 0;
  auto emit = [&](int v) -> bool {
    if (w >= capacity) return false;
    out[w++] = v;
    return true;
  };

  while (!pending.empty()) {
    std::vector<int> take = scan(s, gates, pending, -1);
    int pair = -1;
    if (pair_ok) {
      // candidate pair bits: out-of-window positions, ascending; strict
      // improvement only (bit-identical to the Python oracle)
      std::vector<int> cands;
      for (int i : pending) {
        const Gate& g = gates[i];
        for (int q : {g.q0, g.q1}) {
          if (q < 0) continue;
          int p = s.pos(q);
          if (p >= s.reach) cands.push_back(p);
        }
      }
      std::sort(cands.begin(), cands.end());
      cands.erase(std::unique(cands.begin(), cands.end()), cands.end());
      for (int p : cands) {
        std::vector<int> t = scan(s, gates, pending, p);
        if (t.size() > take.size()) {
          take = std::move(t);
          pair = p;
        }
      }
    }
    if (take.empty()) {
      if (!allow_rotations) return -2;
      return -3;  // cannot happen: rotations always make progress
    }
    if (!emit(1) || !emit(pair) || !emit((int)take.size())) return -1;
    for (int i : take)
      if (!emit(i)) return -1;

    std::vector<char> taken_set(num_gates, 0);
    for (int i : take) taken_set[i] = 1;
    std::vector<int> next;
    next.reserve(pending.size());
    for (int i : pending)
      if (!taken_set[i]) next.push_back(i);
    pending = std::move(next);

    if (!pending.empty() && !allow_rotations) continue;
    if (!pending.empty()) {
      // rotate so the first pending gate's lowest out-of-window position
      // lands at ROT_LO
      const Gate& g0 = gates[pending[0]];
      int pmin = 1 << 30;
      for (int q : {g0.q0, g0.q1}) {
        if (q < 0) continue;
        int p = s.pos(q);
        if (p >= s.reach) pmin = std::min(pmin, p);
      }
      if (pmin == (1 << 30)) {
        for (int i : pending) {
          const Gate& g = gates[i];
          for (int q : {g.q0, g.q1}) {
            if (q < 0) continue;
            int p = s.pos(q);
            if (p >= s.reach) pmin = std::min(pmin, p);
          }
        }
      }
      int shift = pmin - ROT_LO;
      if (shift <= 0) return -3;
      s.rot = (s.rot + shift) % s.size;
      if (!emit(0) || !emit(shift)) return -1;
    }
  }
  if (s.rot % s.size) {
    int shift = (s.size - (s.rot % s.size)) % s.size;
    if (shift && (!emit(0) || !emit(shift))) return -1;
  }
  return w;
}
