/*
 * Native host kernels for mve_tpu — the CPU-bound graph/topology work
 * that stays on the host next to the TPU compute path (the role the
 * reference's C++ libs play for its OpenMP pipeline):
 *
 *  - mesh vertex classification (reference: libs/mve/mesh_info.cc)
 *  - union-find connected components over faces
 *  - edge-collapse batches for needle/cap cleanup
 *    (reference: libs/fssr/mesh_clean.cc)
 *  - boundary-ring confidence expansion
 *    (reference: libs/mve/depthmap.cc:495-545)
 *
 * Exposed as a plain C ABI consumed via ctypes (no pybind11 in the
 * image). All buffers are caller-allocated numpy arrays.
 */

#include <cstdint>
#include <cstring>
#include <vector>
#include <unordered_map>
#include <algorithm>

extern "C" {

/* Vertex classes (mesh_info.h). */
enum { VCLASS_SIMPLE = 0, VCLASS_COMPLEX = 1, VCLASS_BORDER = 2, VCLASS_UNREF = 3 };

/*
 * Classify every vertex from the face list. faces: (n_faces, 3) int32.
 * out_class: (n_verts,) int8.
 */
void mesh_classify_vertices(int64_t n_verts, int64_t n_faces,
                            const int32_t* faces, int8_t* out_class)
{
    /* CSR vertex->face adjacency. */
    std::vector<int64_t> count(n_verts + 1, 0);
    for (int64_t i = 0; i < n_faces * 3; ++i)
        count[faces[i] + 1] += 1;
    for (int64_t v = 0; v < n_verts; ++v)
        count[v + 1] += count[v];
    std::vector<int64_t> adj(n_faces * 3);
    {
        std::vector<int64_t> cursor(count.begin(), count.end() - 1);
        for (int64_t f = 0; f < n_faces; ++f)
            for (int j = 0; j < 3; ++j)
                adj[cursor[faces[f * 3 + j]]++] = f;
    }

    std::vector<std::pair<int32_t, int32_t>> edges;
    std::unordered_map<int32_t, int32_t> starts;
    for (int64_t v = 0; v < n_verts; ++v)
    {
        int64_t lo = count[v], hi = count[v + 1];
        if (lo == hi) { out_class[v] = VCLASS_UNREF; continue; }

        /* Opposite edge (a, b) per incident face. */
        edges.clear();
        for (int64_t k = lo; k < hi; ++k)
        {
            const int32_t* f = faces + adj[k] * 3;
            int i = (f[0] == (int32_t)v) ? 0 : (f[1] == (int32_t)v ? 1 : 2);
            edges.emplace_back(f[(i + 1) % 3], f[(i + 2) % 3]);
        }
        starts.clear();
        bool dup = false;
        for (auto& e : edges)
            if (!starts.emplace(e.first, e.second).second) { dup = true; break; }
        if (dup) { out_class[v] = VCLASS_COMPLEX; continue; }

        /* Find chain starts: 'a' values that are not any 'b'. */
        int n_chain_starts = 0;
        int32_t chain_start = -1;
        for (auto& e : edges)
        {
            bool incoming = false;
            for (auto& e2 : edges)
                if (e2.second == e.first) { incoming = true; break; }
            if (!incoming) { n_chain_starts += 1; chain_start = e.first; }
        }
        if (n_chain_starts == 0)
        {
            /* Closed fan(s): simple iff one cycle covers all edges. */
            int32_t a0 = edges[0].first;
            int64_t seen = 1;
            int32_t cur = starts[a0];
            while (cur != a0 && seen <= (int64_t)edges.size())
            {
                auto it = starts.find(cur);
                if (it == starts.end()) break;
                cur = it->second;
                seen += 1;
            }
            out_class[v] = (seen == (int64_t)edges.size() && cur == a0)
                ? VCLASS_SIMPLE : VCLASS_COMPLEX;
        }
        else if (n_chain_starts == 1)
        {
            int64_t seen = 0;
            int32_t cur = chain_start;
            auto it = starts.find(cur);
            while (it != starts.end() && seen <= (int64_t)edges.size())
            {
                cur = it->second;
                seen += 1;
                it = starts.find(cur);
            }
            out_class[v] = (seen == (int64_t)edges.size())
                ? VCLASS_BORDER : VCLASS_COMPLEX;
        }
        else
            out_class[v] = VCLASS_COMPLEX;
    }
}

/* Union-find with path halving. */
static int64_t uf_find(std::vector<int64_t>& p, int64_t x)
{
    while (p[x] != x) { p[x] = p[p[x]]; x = p[x]; }
    return x;
}

/*
 * Connected components over face edges. out_label: (n_verts,) int64,
 * root vertex id per component.
 */
void mesh_components(int64_t n_verts, int64_t n_faces,
                     const int32_t* faces, int64_t* out_label)
{
    std::vector<int64_t> parent(n_verts);
    for (int64_t i = 0; i < n_verts; ++i) parent[i] = i;
    for (int64_t f = 0; f < n_faces; ++f)
    {
        int64_t a = uf_find(parent, faces[f * 3 + 0]);
        int64_t b = uf_find(parent, faces[f * 3 + 1]);
        int64_t c = uf_find(parent, faces[f * 3 + 2]);
        parent[b] = a;
        parent[uf_find(parent, c)] = uf_find(parent, a);
    }
    for (int64_t i = 0; i < n_verts; ++i)
        out_label[i] = uf_find(parent, i);
}

/*
 * Apply a batch of edge collapses (b -> a). verts: (n_verts, 3) float32
 * updated in place with midpoints. out_target: (n_verts,) int64 final
 * remap. Returns number of collapses applied. Collapses touching an
 * already-collapsed vertex this batch are skipped (mesh_clean.cc
 * semantics of one pass).
 */
int64_t mesh_collapse_edges(int64_t n_verts, int64_t n_edges,
                            const int64_t* edges, float* verts,
                            int64_t* out_target)
{
    std::vector<int64_t> parent(n_verts);
    for (int64_t i = 0; i < n_verts; ++i) parent[i] = i;
    std::vector<uint8_t> touched(n_verts, 0);
    int64_t count = 0;
    for (int64_t e = 0; e < n_edges; ++e)
    {
        int64_t a = uf_find(parent, edges[e * 2 + 0]);
        int64_t b = uf_find(parent, edges[e * 2 + 1]);
        if (a == b || touched[a] || touched[b])
            continue;
        parent[b] = a;
        for (int j = 0; j < 3; ++j)
            verts[a * 3 + j] = 0.5f * (verts[a * 3 + j] + verts[b * 3 + j]);
        touched[a] = 1;
        count += 1;
    }
    for (int64_t i = 0; i < n_verts; ++i)
        out_target[i] = uf_find(parent, i);
    return count;
}

/*
 * Boundary confidence rings (depthmap.cc:495-545): starting from border
 * vertices (vclass == BORDER), assign conf = ring/iterations expanding
 * over vertex adjacency. confs must be pre-filled with 1.0.
 */
void mesh_boundary_confidences(int64_t n_verts, int64_t n_faces,
                               const int32_t* faces, const int8_t* vclass,
                               int32_t iterations, float* confs)
{
    /* Vertex adjacency CSR from faces. */
    std::vector<int64_t> count(n_verts + 1, 0);
    for (int64_t f = 0; f < n_faces; ++f)
        for (int j = 0; j < 3; ++j)
            count[faces[f * 3 + j] + 1] += 2;
    for (int64_t v = 0; v < n_verts; ++v)
        count[v + 1] += count[v];
    std::vector<int32_t> adj(count[n_verts]);
    {
        std::vector<int64_t> cursor(count.begin(), count.end() - 1);
        for (int64_t f = 0; f < n_faces; ++f)
        {
            const int32_t* t = faces + f * 3;
            for (int j = 0; j < 3; ++j)
            {
                adj[cursor[t[j]]++] = t[(j + 1) % 3];
                adj[cursor[t[j]]++] = t[(j + 2) % 3];
            }
        }
    }

    std::vector<int64_t> ring, next;
    for (int64_t v = 0; v < n_verts; ++v)
        if (vclass[v] == VCLASS_BORDER)
            ring.push_back(v);

    for (int32_t it = 0; it < iterations; ++it)
    {
        float conf = (float)it / (float)iterations;
        for (int64_t v : ring)
            confs[v] = conf;
        next.clear();
        for (int64_t v : ring)
            for (int64_t k = count[v]; k < count[v + 1]; ++k)
            {
                int32_t w = adj[k];
                if (confs[w] == 1.0f)
                {
                    confs[w] = -2.0f; /* mark */
                    next.push_back(w);
                }
            }
        for (int64_t v : next)
            confs[v] = 1.0f;
        std::swap(ring, next);
    }
}

}  /* extern "C" */
