// Block-table runtime: Morton-ordered AMR block bookkeeping.
//
// TPU-native replacement for the host-side half of the reference's
// fully-threaded tree (reference: src/ftt.c — neighbor lookup ftt.h:432-530,
// refine ftt_cell_refine_single ftt.c:146 with corner grading
// ftt_refine_corner, coarsen ftt.c:2282, and the reshape/grading fixpoint
// gfs_domain_reshape src/adaptive.c:998-1022).  The device arrays stay
// dense per level (SURVEY.md §7 core representational decision); this
// library owns the block tables: Morton keys, level maps, 2:1 grading,
// neighbor/slot resolution — pointer-free, array-in/array-out, so the
// Python layer can hand the plans straight to gather/scatter kernels.
//
// Build: g++ -O3 -shared -fPIC block_table.cpp -o libblocktable.so
// ABI: plain C (int64 keys = Morton code | level<<56), ctypes-friendly.

#include <cstdint>
#include <cstring>
#include <unordered_set>
#include <unordered_map>
#include <vector>
#include <algorithm>

extern "C" {

// ---------------------------------------------------------------------------
// Morton encoding (2D and 3D), 21 bits per axis max
// ---------------------------------------------------------------------------

static inline uint64_t part1by1(uint64_t x) {
    x &= 0x00000000ffffffffull;
    x = (x | (x << 16)) & 0x0000ffff0000ffffull;
    x = (x | (x << 8))  & 0x00ff00ff00ff00ffull;
    x = (x | (x << 4))  & 0x0f0f0f0f0f0f0f0full;
    x = (x | (x << 2))  & 0x3333333333333333ull;
    x = (x | (x << 1))  & 0x5555555555555555ull;
    return x;
}

static inline uint64_t unpart1by1(uint64_t x) {
    x &= 0x5555555555555555ull;
    x = (x | (x >> 1))  & 0x3333333333333333ull;
    x = (x | (x >> 2))  & 0x0f0f0f0f0f0f0f0full;
    x = (x | (x >> 4))  & 0x00ff00ff00ff00ffull;
    x = (x | (x >> 8))  & 0x0000ffff0000ffffull;
    x = (x | (x >> 16)) & 0x00000000ffffffffull;
    return x;
}

static inline uint64_t part1by2(uint64_t x) {
    x &= 0x1fffffull;
    x = (x | (x << 32)) & 0x1f00000000ffffull;
    x = (x | (x << 16)) & 0x1f0000ff0000ffull;
    x = (x | (x << 8))  & 0x100f00f00f00f00full;
    x = (x | (x << 4))  & 0x10c30c30c30c30c3ull;
    x = (x | (x << 2))  & 0x1249249249249249ull;
    return x;
}

static inline uint64_t unpart1by2(uint64_t x) {
    x &= 0x1249249249249249ull;
    x = (x | (x >> 2))  & 0x10c30c30c30c30c3ull;
    x = (x | (x >> 4))  & 0x100f00f00f00f00full;
    x = (x | (x >> 8))  & 0x1f0000ff0000ffull;
    x = (x | (x >> 16)) & 0x1f00000000ffffull;
    x = (x | (x >> 32)) & 0x1fffffull;
    return x;
}

void morton_encode_2d(const int64_t* ix, const int64_t* iy, int64_t n,
                      int64_t* out) {
    for (int64_t i = 0; i < n; i++)
        out[i] = (int64_t)(part1by1((uint64_t)ix[i]) |
                           (part1by1((uint64_t)iy[i]) << 1));
}

void morton_decode_2d(const int64_t* code, int64_t n,
                      int64_t* ix, int64_t* iy) {
    for (int64_t i = 0; i < n; i++) {
        ix[i] = (int64_t)unpart1by1((uint64_t)code[i]);
        iy[i] = (int64_t)unpart1by1((uint64_t)code[i] >> 1);
    }
}

void morton_encode_3d(const int64_t* ix, const int64_t* iy,
                      const int64_t* iz, int64_t n, int64_t* out) {
    for (int64_t i = 0; i < n; i++)
        out[i] = (int64_t)(part1by2((uint64_t)ix[i]) |
                           (part1by2((uint64_t)iy[i]) << 1) |
                           (part1by2((uint64_t)iz[i]) << 2));
}

void morton_decode_3d(const int64_t* code, int64_t n,
                      int64_t* ix, int64_t* iy, int64_t* iz) {
    for (int64_t i = 0; i < n; i++) {
        ix[i] = (int64_t)unpart1by2((uint64_t)code[i]);
        iy[i] = (int64_t)unpart1by2((uint64_t)code[i] >> 1);
        iz[i] = (int64_t)unpart1by2((uint64_t)code[i] >> 2);
    }
}

// ---------------------------------------------------------------------------
// Block keys: level (8 bits) | morton (56 bits).  A block at (level, i, j)
// covers cells [i*B, (i+1)*B) x [j*B, (j+1)*B) at that level.
// ---------------------------------------------------------------------------

static inline int64_t make_key(int level, uint64_t morton) {
    return ((int64_t)level << 56) | (int64_t)(morton & 0xffffffffffffffull);
}
static inline int key_level(int64_t k) { return (int)(k >> 56); }
static inline uint64_t key_morton(int64_t k) {
    return (uint64_t)k & 0xffffffffffffffull;
}

// 2:1 grading fixpoint (2D): every face/corner neighbor of an existing
// block must exist at level >= l-1.  Missing coarser ancestry is created.
// Mirrors gfs_domain_reshape's iterate-until-no-change corner grading
// (src/adaptive.c:1003-1009, ftt_refine_corner).
//
// blocks: keys of existing leaf blocks.  Returns the full graded leaf set
// through out_keys (caller buffer, cap elements); returns count or -1 if
// the buffer is too small.
int64_t grade_2to1_2d(const int64_t* keys, int64_t n, int64_t root_blocks_x,
                      int64_t root_blocks_y, int64_t cap, int64_t* out_keys) {
    std::unordered_set<int64_t> leaves(keys, keys + n);

    auto exists_at_or_above = [&](int level, int64_t bx, int64_t by) {
        // any leaf covering (level, bx, by) at level' in [0..level]?
        int64_t x = bx, y = by;
        for (int l = level; l >= 0; l--) {
            int64_t key = make_key(l, part1by1((uint64_t)x) |
                                      (part1by1((uint64_t)y) << 1));
            if (leaves.count(key)) return true;
            x >>= 1; y >>= 1;
        }
        return false;
    };

    bool changed = true;
    while (changed) {
        changed = false;
        std::vector<int64_t> snapshot(leaves.begin(), leaves.end());
        for (int64_t key : snapshot) {
            int l = key_level(key);
            if (l == 0) continue;
            uint64_t m = key_morton(key);
            int64_t bx = (int64_t)unpart1by1(m);
            int64_t by = (int64_t)unpart1by1(m >> 1);
            int64_t nx = root_blocks_x << l, ny = root_blocks_y << l;
            for (int dy = -1; dy <= 1; dy++)
                for (int dx = -1; dx <= 1; dx++) {
                    if (!dx && !dy) continue;
                    int64_t qx = bx + dx, qy = by + dy;
                    if (qx < 0 || qy < 0 || qx >= nx || qy >= ny) continue;
                    if (exists_at_or_above(l, qx, qy)) continue;
                    // finer neighbors may exist; that's fine (they are
                    // at most one level finer once grading converges)
                    int64_t cx = qx >> 1, cy = qy >> 1;
                    // check a descendant exists (qx,qy covered by finer)
                    // approximate: if any child key exists one level down
                    int64_t k1 = make_key(l + 1,
                        part1by1((uint64_t)(qx * 2)) |
                        (part1by1((uint64_t)(qy * 2)) << 1));
                    bool finer = false;
                    for (int cc = 0; cc < 4 && !finer; cc++) {
                        int64_t fx = qx * 2 + (cc & 1), fy = qy * 2 + (cc >> 1);
                        int64_t kk = make_key(l + 1,
                            part1by1((uint64_t)fx) |
                            (part1by1((uint64_t)fy) << 1));
                        if (leaves.count(kk)) finer = true;
                    }
                    (void)k1; (void)cx; (void)cy;
                    if (finer) continue;
                    // create the missing neighbor at level l-1 by refining
                    // its covering coarse leaf until level l-1
                    int64_t px = qx, py = qy;
                    int pl = l;
                    while (pl > 0 && !exists_at_or_above(pl, px, py)) {
                        px >>= 1; py >>= 1; pl--;
                    }
                    // find the actual covering leaf level
                    int64_t ax = qx >> (l - pl), ay = qy >> (l - pl);
                    int cover_l = -1;
                    {
                        int64_t x = qx, y = qy;
                        for (int ll = l; ll >= 0; ll--) {
                            int64_t kk = make_key(ll,
                                part1by1((uint64_t)x) |
                                (part1by1((uint64_t)y) << 1));
                            if (leaves.count(kk)) { cover_l = ll; ax = x; ay = y; break; }
                            x >>= 1; y >>= 1;
                        }
                    }
                    if (cover_l < 0 || cover_l >= l - 1) continue;
                    // refine covering leaf once: replace by its 4 children
                    int64_t ck = make_key(cover_l,
                        part1by1((uint64_t)ax) | (part1by1((uint64_t)ay) << 1));
                    leaves.erase(ck);
                    for (int cc = 0; cc < 4; cc++) {
                        int64_t fx = ax * 2 + (cc & 1), fy = ay * 2 + (cc >> 1);
                        leaves.insert(make_key(cover_l + 1,
                            part1by1((uint64_t)fx) |
                            (part1by1((uint64_t)fy) << 1)));
                    }
                    changed = true;
                }
        }
    }
    if ((int64_t)leaves.size() > cap) return -1;
    int64_t i = 0;
    for (int64_t k : leaves) out_keys[i++] = k;
    std::sort(out_keys, out_keys + i);   // (level, morton) order
    return i;
}

// Refine marked blocks (replace by 4 children), coarsen marked sibling
// quads (replace 4 children by parent when ALL are marked).  Returns new
// count or -1 if cap too small.
int64_t apply_marks_2d(const int64_t* keys, const int8_t* marks, int64_t n,
                       int64_t cap, int64_t* out_keys) {
    // marks: +1 refine, -1 coarsen candidate, 0 keep
    std::unordered_map<int64_t, int> coarsen_votes;
    std::vector<int64_t> out;
    out.reserve(n * 2);
    for (int64_t i = 0; i < n; i++) {
        int64_t key = keys[i];
        int l = key_level(key);
        uint64_t m = key_morton(key);
        int64_t bx = (int64_t)unpart1by1(m), by = (int64_t)unpart1by1(m >> 1);
        if (marks[i] > 0) {
            for (int cc = 0; cc < 4; cc++) {
                int64_t fx = bx * 2 + (cc & 1), fy = by * 2 + (cc >> 1);
                out.push_back(make_key(l + 1,
                    part1by1((uint64_t)fx) | (part1by1((uint64_t)fy) << 1)));
            }
        } else if (marks[i] < 0 && l > 0) {
            int64_t pk = make_key(l - 1, part1by1((uint64_t)(bx >> 1)) |
                                  (part1by1((uint64_t)(by >> 1)) << 1));
            coarsen_votes[pk]++;
        } else {
            out.push_back(key);
        }
    }
    for (int64_t i = 0; i < n; i++) {
        if (marks[i] < 0) {
            int64_t key = keys[i];
            int l = key_level(key);
            if (l == 0) { out.push_back(key); continue; }
            uint64_t m = key_morton(key);
            int64_t bx = (int64_t)unpart1by1(m), by = (int64_t)unpart1by1(m >> 1);
            int64_t pk = make_key(l - 1, part1by1((uint64_t)(bx >> 1)) |
                                  (part1by1((uint64_t)(by >> 1)) << 1));
            auto it = coarsen_votes.find(pk);
            if (it != coarsen_votes.end() && it->second == 4) {
                // first sibling emits the parent; others skip
                if ((bx & 1) == 0 && (by & 1) == 0) out.push_back(pk);
            } else {
                out.push_back(key);   // not all siblings agreed: keep
            }
        }
    }
    if ((int64_t)out.size() > cap) return -1;
    std::sort(out.begin(), out.end());
    std::memcpy(out_keys, out.data(), out.size() * sizeof(int64_t));
    return (int64_t)out.size();
}

// Face-neighbor resolution: for each block and each of the 4 directions,
// return the covering leaf's index in `keys` and its level delta
// (-1 coarser, 0 same, +1 finer with 2 children -> returns first child
// index, delta=+1; missing/domain boundary -> -1).
// keys must be sorted; idx/delta are n x 4 row-major.
void neighbors_2d(const int64_t* keys, int64_t n, int64_t root_bx,
                  int64_t root_by, int64_t* idx, int8_t* delta) {
    std::unordered_map<int64_t, int64_t> slot;
    slot.reserve(n * 2);
    for (int64_t i = 0; i < n; i++) slot[keys[i]] = i;
    const int dxs[4] = {-1, 1, 0, 0};
    const int dys[4] = {0, 0, -1, 1};
    for (int64_t i = 0; i < n; i++) {
        int l = key_level(keys[i]);
        uint64_t m = key_morton(keys[i]);
        int64_t bx = (int64_t)unpart1by1(m), by = (int64_t)unpart1by1(m >> 1);
        int64_t nx = root_bx << l, ny = root_by << l;
        for (int d = 0; d < 4; d++) {
            int64_t qx = bx + dxs[d], qy = by + dys[d];
            int64_t* oi = &idx[i * 4 + d];
            int8_t* od = &delta[i * 4 + d];
            *oi = -1; *od = 0;
            if (qx < 0 || qy < 0 || qx >= nx || qy >= ny) continue;
            int64_t k = make_key(l, part1by1((uint64_t)qx) |
                                 (part1by1((uint64_t)qy) << 1));
            auto it = slot.find(k);
            if (it != slot.end()) { *oi = it->second; continue; }
            // coarser?
            k = make_key(l - 1, part1by1((uint64_t)(qx >> 1)) |
                         (part1by1((uint64_t)(qy >> 1)) << 1));
            it = slot.find(k);
            if (l > 0 && it != slot.end()) { *oi = it->second; *od = -1; continue; }
            // finer? return the first child touching the shared face
            int64_t fx = qx * 2 + (dxs[d] < 0 ? 1 : (dxs[d] > 0 ? 0 : 0));
            int64_t fy = qy * 2 + (dys[d] < 0 ? 1 : (dys[d] > 0 ? 0 : 0));
            k = make_key(l + 1, part1by1((uint64_t)fx) |
                         (part1by1((uint64_t)fy) << 1));
            it = slot.find(k);
            if (it != slot.end()) { *oi = it->second; *od = 1; }
        }
    }
}

}  // extern "C"
