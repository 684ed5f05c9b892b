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
#include <queue>
#include <utility>

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

// Greedy stagger packing (dag/schedule.py stagger_offsets semantics,
// bit-identical tie-breaking): choose a per-graph level offset that
// minimises the total padded scan-row count. Deepest graph first (then
// widest, then lowest id), best-fit start position (first argmin).
// level/node_graph: [n] per-node; edge_dst: [e] message-target node ids
// (only read when edge_budget > 0; pass e = 0 to disable).
// out_offs: [num_graphs]. Returns 0 (or -1 on invalid input).
static inline int64_t rows_of_one(int64_t w, int64_t ev, int64_t kn,
                                  int64_t edge_budget) {
    int64_t r = (w + kn - 1) / kn;
    if (w > 0 && r < 1) r = 1;
    if (edge_budget > 0) {
        int64_t be = (ev + edge_budget - 1) / edge_budget;
        int64_t cap = w > 1 ? w : 1;
        int64_t alt = (be < cap ? be : cap) * (w > 0 ? 1 : 0);
        if (alt > r) r = alt;
    }
    return r;
}

int dag_stagger_offsets(const int64_t* level, const int64_t* node_graph,
                        int64_t n, int64_t num_graphs,
                        const int64_t* edge_dst, int64_t e,
                        int64_t kn, int64_t edge_budget,
                        int64_t* out_offs) {
    for (int64_t g = 0; g < num_graphs; ++g) out_offs[g] = 0;
    if (num_graphs <= 1 || n == 0) return 0;

    std::vector<int64_t> depth(num_graphs, 0);
    for (int64_t i = 0; i < n; ++i) {
        int64_t g = node_graph[i];
        if (g < 0 || g >= num_graphs) return -1;
        if (level[i] < 0) return -1;  // would index profiles out of bounds
        if (level[i] + 1 > depth[g]) depth[g] = level[i] + 1;
    }
    int64_t max_d = 0, total_d = 0;
    for (int64_t g = 0; g < num_graphs; ++g) {
        if (depth[g] > max_d) max_d = depth[g];
        total_d += depth[g];
    }
    if (max_d == 0) return 0;

    // per-graph (width, edge-load) profiles over graph-local levels
    std::vector<int64_t> start(num_graphs + 1, 0);
    for (int64_t g = 0; g < num_graphs; ++g) start[g + 1] = start[g] + depth[g];
    std::vector<int64_t> prof_w(total_d, 0), prof_e(total_d, 0);
    std::vector<int64_t> width_sum(num_graphs, 0);
    for (int64_t i = 0; i < n; ++i) {
        prof_w[start[node_graph[i]] + level[i]]++;
        width_sum[node_graph[i]]++;
    }
    if (edge_budget > 0) {
        for (int64_t j = 0; j < e; ++j) {
            int64_t t = edge_dst[j];
            if (t < 0 || t >= n) return -1;  // mirror the numpy IndexError
            prof_e[start[node_graph[t]] + level[t]]++;
        }
    }

    // order: depth desc, total width desc, graph id asc (numpy lexsort)
    std::vector<int64_t> order(num_graphs);
    for (int64_t g = 0; g < num_graphs; ++g) order[g] = g;
    std::stable_sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
        if (depth[a] != depth[b]) return depth[a] > depth[b];
        return width_sum[a] > width_sum[b];
    });

    int64_t cap = total_d + max_d + 1;
    std::vector<int64_t> W(cap, 0), Ev(cap, 0), R(cap, 0);
    int64_t length = 0;
    for (int64_t oi = 0; oi < num_graphs; ++oi) {
        int64_t g = order[oi];
        int64_t d = depth[g];
        if (d == 0) continue;
        const int64_t* w = prof_w.data() + start[g];
        const int64_t* ev = prof_e.data() + start[g];
        int64_t best_delta = 0, best_cost = INT64_MAX;
        for (int64_t delta = 0; delta <= length; ++delta) {
            int64_t cost = 0;
            for (int64_t l = 0; l < d; ++l)
                cost += rows_of_one(W[delta + l] + w[l], Ev[delta + l] + ev[l],
                                    kn, edge_budget) - R[delta + l];
            if (cost < best_cost) { best_cost = cost; best_delta = delta; }
        }
        out_offs[g] = best_delta;
        for (int64_t l = 0; l < d; ++l) {
            W[best_delta + l] += w[l];
            Ev[best_delta + l] += ev[l];
            R[best_delta + l] = rows_of_one(W[best_delta + l],
                                            Ev[best_delta + l], kn,
                                            edge_budget);
        }
        if (best_delta + d > length) length = best_delta + d;
    }
    return 0;
}


// Critical-path list scheduling (schedule.pack_rows semantics, identical
// pop order: max remaining depth first, ties by smallest node id; stash
// probe bounded at 64 like the Python reference). Returns -1 when
// edge_budget < max in-degree.
int dag_pack_rows(const int64_t* rdepth, const int64_t* msg_src,
                  const int64_t* msg_dst, int64_t n, int64_t e,
                  int64_t kn, int64_t edge_budget, int64_t tg_budget,
                  int64_t* out_row) {
    if (n == 0) return 0;
    std::vector<int64_t> indeg(n, 0), outdeg(n, 0);
    for (int64_t i = 0; i < e; ++i) {
        if (msg_dst[i] < 0 || msg_dst[i] >= n) return -2;
        if (msg_src[i] < 0 || msg_src[i] >= n) return -2;
        indeg[msg_dst[i]]++;
        outdeg[msg_src[i]]++;
    }
    int64_t max_in = 0, max_out = 0;
    for (int64_t v = 0; v < n; ++v) {
        max_in = std::max(max_in, indeg[v]);
        max_out = std::max(max_out, outdeg[v]);
    }
    if (max_in > edge_budget) return -1;
    if (tg_budget && max_out > tg_budget) tg_budget = max_out;

    // out-adjacency grouped by source, original edge order preserved
    std::vector<int64_t> ostart(n + 1, 0), adj(e);
    for (int64_t i = 0; i < e; ++i) ostart[msg_src[i] + 1]++;
    for (int64_t v = 0; v < n; ++v) ostart[v + 1] += ostart[v];
    {
        std::vector<int64_t> cur(ostart.begin(), ostart.end() - 1);
        for (int64_t i = 0; i < e; ++i) adj[cur[msg_src[i]]++] = msg_dst[i];
    }

    // min-heap on (-rdepth, id): pops max depth, ties smallest id —
    // matches heapq over (-rdepth[u], u)
    typedef std::pair<int64_t, int64_t> Item;
    std::priority_queue<Item, std::vector<Item>, std::greater<Item> > ready;
    std::vector<int64_t> npreds(indeg);
    for (int64_t v = 0; v < n; ++v)
        if (npreds[v] == 0) ready.push(Item(-rdepth[v], v));
    std::vector<std::vector<int64_t> > pending;
    std::vector<Item> stash;
    int64_t r = 0, placed = 0;
    while (placed < n) {
        if (r < (int64_t)pending.size()) {
            for (size_t i = 0; i < pending[r].size(); ++i) {
                int64_t u = pending[r][i];
                ready.push(Item(-rdepth[u], u));
            }
            pending[r].clear();
        }
        int64_t nc = 0, ec = 0, tc = 0;
        stash.clear();
        while (!ready.empty() && nc < kn) {
            Item it = ready.top();
            ready.pop();
            int64_t u = it.second;
            if (ec + indeg[u] > edge_budget ||
                (tg_budget && tc + outdeg[u] > tg_budget)) {
                stash.push_back(it);
                if ((int64_t)stash.size() > 64) break;
                continue;
            }
            out_row[u] = r;
            nc++;
            ec += indeg[u];
            tc += outdeg[u];
            placed++;
            for (int64_t ei = ostart[u]; ei < ostart[u + 1]; ++ei) {
                int64_t v = adj[ei];
                if (--npreds[v] == 0) {
                    if ((int64_t)pending.size() <= r + 1)
                        pending.resize(r + 2);
                    pending[r + 1].push_back(v);
                }
            }
        }
        for (size_t i = 0; i < stash.size(); ++i) ready.push(stash[i]);
        r++;
    }
    return 0;
}

}  // extern "C"
