// dagcore: native DAG preprocessing kernels.
//
// The framework's host-side hot path: topological leveling and wavefront
// schedule layout for hundreds of thousands of graphs (the reference runs
// this as a per-graph numpy loop at dataset-process time,
// ogb/io/read_graph_pyg.py:51-54 -> src/utils_dag.py:8-35). Exposed via a
// plain C ABI consumed through ctypes (dagnn_tpu/dag/native.py).
//
// Build: cc -O2 -shared -fPIC -o libdagcore.so dagcore.cpp

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Kahn leveling. Returns 0 on success, -1 on cycle.
// src/dst: edge arrays [e]; out_level: [n].
int dag_topo_levels(const int64_t* src, const int64_t* dst, int64_t e,
                    int64_t n, int32_t* out_level) {
    std::vector<int64_t> indeg(n, 0);
    std::vector<int64_t> head(n, -1), next(e, -1);
    for (int64_t i = 0; i < e; ++i) {
        indeg[dst[i]]++;
        next[i] = head[src[i]];
        head[src[i]] = i;
    }
    std::vector<int64_t> queue;
    queue.reserve(n);
    for (int64_t v = 0; v < n; ++v) {
        out_level[v] = 0;
        if (indeg[v] == 0) queue.push_back(v);
    }
    size_t qi = 0;
    int64_t done = 0;
    while (qi < queue.size()) {
        int64_t v = queue[qi++];
        done++;
        for (int64_t i = head[v]; i != -1; i = next[i]) {
            int64_t u = dst[i];
            int32_t cand = out_level[v] + 1;
            if (cand > out_level[u]) out_level[u] = cand;
            if (--indeg[u] == 0) queue.push_back(u);
        }
    }
    return done == n ? 0 : -1;
}

// Batched leveling over concatenated graphs: offsets[g]..offsets[g+1] give
// each graph's node range, eoffsets likewise for edges (edge endpoints are
// LOCAL to the graph). Returns 0, or -(g+1) if graph g has a cycle.
int dag_topo_levels_batch(const int64_t* src, const int64_t* dst,
                          const int64_t* noffsets, const int64_t* eoffsets,
                          int64_t num_graphs, int32_t* out_level) {
    for (int64_t g = 0; g < num_graphs; ++g) {
        int64_t n = noffsets[g + 1] - noffsets[g];
        int64_t e = eoffsets[g + 1] - eoffsets[g];
        int r = dag_topo_levels(src + eoffsets[g], dst + eoffsets[g], e, n,
                                out_level + noffsets[g]);
        if (r != 0) return -(int)(g + 1);
    }
    return 0;
}

// Row/slot assignment for the chunked wavefront schedule
// (dag/schedule.py semantics): given per-node levels and a chunk width,
// assign (row, pos) per node; returns the number of rows.
int64_t dag_row_assign(const int32_t* level, int64_t n, int64_t chunk,
                       int32_t* out_row, int32_t* out_pos) {
    int32_t max_lvl = -1;
    for (int64_t i = 0; i < n; ++i)
        if (level[i] > max_lvl) max_lvl = level[i];
    int64_t L = (int64_t)max_lvl + 1;
    if (L <= 0) return 0;
    std::vector<int64_t> counts(L, 0);
    for (int64_t i = 0; i < n; ++i) counts[level[i]]++;
    std::vector<int64_t> row_base(L + 1, 0);
    for (int64_t l = 0; l < L; ++l) {
        int64_t rows = (counts[l] + chunk - 1) / chunk;
        if (rows < 1) rows = 1;
        row_base[l + 1] = row_base[l] + rows;
    }
    // slot within level = rank by node id (stable): count in level order
    std::vector<int64_t> seen(L, 0);
    for (int64_t i = 0; i < n; ++i) {
        int64_t l = level[i];
        int64_t slot = seen[l]++;
        out_row[i] = (int32_t)(row_base[l] + slot / chunk);
        out_pos[i] = (int32_t)(slot % chunk);
    }
    return row_base[L];
}

// Balanced row/slot assignment (dag/schedule.py balance=True semantics):
// nodes within a level are dealt serpentine in descending (in+out)-degree
// order across the level's rows, evening per-row edge loads; levels with
// more than rows*edge_budget incoming edges get extra rows (edge_budget=0
// disables). indeg/outdeg: per-node degree arrays. Returns row count.
int64_t dag_row_assign_balanced(const int32_t* level, const int64_t* indeg,
                                const int64_t* outdeg, int64_t n,
                                int64_t chunk, int64_t edge_budget,
                                int32_t* out_row, int32_t* out_pos) {
    int32_t max_lvl = -1;
    for (int64_t i = 0; i < n; ++i)
        if (level[i] > max_lvl) max_lvl = level[i];
    int64_t L = (int64_t)max_lvl + 1;
    if (L <= 0) return 0;
    std::vector<int64_t> counts(L, 0), lvl_edges(L, 0);
    for (int64_t i = 0; i < n; ++i) {
        counts[level[i]]++;
        lvl_edges[level[i]] += indeg[i];
    }
    std::vector<int64_t> rows_pl(L, 0), row_base(L + 1, 0);
    for (int64_t l = 0; l < L; ++l) {
        int64_t rows = (counts[l] + chunk - 1) / chunk;
        if (rows < 1) rows = 1;
        if (edge_budget > 0) {
            int64_t by_edges = (lvl_edges[l] + edge_budget - 1) / edge_budget;
            int64_t cap = counts[l] > 0 ? counts[l] : 1;
            if (by_edges > cap) by_edges = cap;
            if (by_edges > rows) rows = by_edges;
        }
        rows_pl[l] = rows;
        row_base[l + 1] = row_base[l] + rows;
    }
    // bucket nodes by level in id order, then stable-sort each bucket by
    // descending load (ties keep id order) — matches numpy lexsort keys
    std::vector<int64_t> lvl_start(L + 1, 0);
    for (int64_t l = 0; l < L; ++l) lvl_start[l + 1] = lvl_start[l] + counts[l];
    std::vector<int64_t> bucket(n), fill(L, 0);
    for (int64_t i = 0; i < n; ++i)
        bucket[lvl_start[level[i]] + fill[level[i]]++] = i;
    for (int64_t l = 0; l < L; ++l) {
        int64_t* b = bucket.data() + lvl_start[l];
        std::stable_sort(b, b + counts[l], [&](int64_t a, int64_t c) {
            return indeg[a] + outdeg[a] > indeg[c] + outdeg[c];
        });
        int64_t r = rows_pl[l];
        for (int64_t k = 0; k < counts[l]; ++k) {
            int64_t pass = k / r, pip = k % r;
            int64_t row_in_lvl = (pass % 2 == 0) ? pip : r - 1 - pip;
            out_row[b[k]] = (int32_t)(row_base[l] + row_in_lvl);
            out_pos[b[k]] = (int32_t)pass;
        }
    }
    return row_base[L];
}

}  // extern "C"
