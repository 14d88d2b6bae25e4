// Native greedy packer for windowed-gather plans.
//
// Ports the O(H) first-fit hot loop of prep/window.build_halfedge_plan
// (pure host preprocessing: per-key layer BITMASKS, per-cell source
// selection, pair spilling) to C++. The Python loop costs ~25 s at
// 2.28M edges (4.5M halves) and minutes at the 8M-edge capacity point
// (BASELINE.md:142-144); this is the same algorithm bit-for-bit, so the
// resulting plans are identical — the Python implementation remains as
// the specification and fallback.
//
// Exposed via a C ABI (ctypes, native/loader.py conventions — pybind11
// is not available in this environment).

#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

extern "C" {

// Returns the number of placed half-edges. All output arrays are
// caller-allocated; placement must arrive filled with -1 and pair_ok
// (when pair_id != nullptr) filled with 1.
int64_t mgcfd_pack_halfedges(
    int64_t H,
    const int64_t* order,       // processing order (indices into H)
    const int32_t* ow,          // owner window per half-edge
    const int32_t* lwv_arr,     // local (neighborhood) window offset
    const int32_t* o_row, const int32_t* o_lane,
    const int32_t* g_row, const int32_t* g_lane,
    const uint8_t* in_range,    // neighborhood-range mask
    const int64_t* pair_id,     // nullptr = independent halves
    uint8_t* pair_ok,           // [npair], in/out
    int64_t n_win, int64_t kw, int64_t l_cap, int64_t S,
    int32_t* placement,         // [H] out (init -1)
    int32_t* place_src,         // [H] out
    int32_t* layer_count,       // [n_win] out (init 0)
    int32_t* layer_wins,        // [n_win * l_cap * S] out (init 0)
    int32_t* nsrc_used)         // [n_win * l_cap] out (init 0)
{
    const int64_t WIN = 1024;
    std::vector<uint64_t> slot_mask(n_win * WIN, 0);  // key: owner node
    std::vector<uint64_t> cell_mask(n_win * WIN, 0);  // key: (w,grow,olane)
    std::vector<uint64_t> pos_mask(n_win * WIN, 0);   // key: (w,grow,glane)
    std::vector<uint64_t> winset_mask(n_win * kw, 0); // layers sourcing lw
    std::vector<int32_t> winslot(n_win * l_cap * kw, -1);
    std::vector<uint64_t> spare_mask(n_win, 0);       // |source set| < S
    std::unordered_map<uint64_t, uint64_t> val_mask;  // exact-value reuse
    val_mask.reserve(static_cast<size_t>(H));
    // layers where table position pk is already bound to THIS window
    std::unordered_map<uint64_t, uint64_t> pos_lw_mask;
    pos_lw_mask.reserve(static_cast<size_t>(H));

    int64_t placed = 0;
    for (int64_t i = 0; i < H; ++i) {
        const int64_t h = order[i];
        if (!in_range[h]) continue;
        if (pair_id && !pair_ok[pair_id[h]]) continue;
        const int64_t wv = ow[h];
        const int64_t lwv = lwv_arr[h];
        const int64_t sk = wv * WIN + o_row[h] * 128 + o_lane[h];
        const int64_t ck = wv * WIN + g_row[h] * 128 + o_lane[h];
        const int64_t pk = wv * WIN + g_row[h] * 128 + g_lane[h];
        const uint64_t vk = (static_cast<uint64_t>(ck) << 14)
                            | (static_cast<uint64_t>(lwv) << 7)
                            | static_cast<uint64_t>(g_lane[h]);
        const uint64_t plk = (static_cast<uint64_t>(pk) << 7)
                             | static_cast<uint64_t>(lwv);
        const int64_t wk = wv * kw + lwv;
        const uint64_t have_win = winset_mask[wk];
        const uint64_t free_m = ~slot_mask[sk]
                                & (have_win | spare_mask[wv]);
        uint64_t vm = 0;
        auto it = val_mask.find(vk);
        if (it != val_mask.end()) vm = it->second;
        uint64_t plm = 0;
        auto it2 = pos_lw_mask.find(plk);
        if (it2 != pos_lw_mask.end()) plm = it2->second;
        uint64_t cand = free_m & (~cell_mask[ck] | vm);
        cand &= ~pos_mask[pk] | plm;
        int64_t layer;
        if (cand) {
            layer = __builtin_ctzll(cand);
        } else {
            layer = layer_count[wv];
            if (layer >= l_cap) {
                if (pair_id) pair_ok[pair_id[h]] = 0;
                continue;
            }
            layer_count[wv] = static_cast<int32_t>(layer + 1);
            spare_mask[wv] |= 1ull << layer;
        }
        const uint64_t bit = 1ull << layer;
        int32_t* ws = &winslot[(wv * l_cap + layer) * kw + lwv];
        int32_t src = *ws;
        if (src < 0) {
            src = nsrc_used[wv * l_cap + layer];
            *ws = src;
            layer_wins[(wv * l_cap + layer) * S + src] =
                static_cast<int32_t>(lwv);
            nsrc_used[wv * l_cap + layer] = src + 1;
            winset_mask[wk] |= bit;
            if (src + 1 == S) spare_mask[wv] &= ~bit;
        }
        slot_mask[sk] |= bit;
        cell_mask[ck] |= bit;
        pos_mask[pk] |= bit;
        val_mask[vk] = vm | bit;
        pos_lw_mask[plk] = plm | bit;
        placement[h] = static_cast<int32_t>(layer);
        place_src[h] = src;
        ++placed;
    }
    return placed;
}

}  // extern "C"
