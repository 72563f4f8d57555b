// Native block-dense graph packer, C++17, C ABI.
//
// Bit-identical port of data/batch.py::pack_graphs (first-fit placement,
// gather-only ELL adjacency, sentinel conventions — see that module's
// docstring for the format).  At ~13 Medge/s device throughput the Python
// packer becomes the host bottleneck in real training; this native path
// packs a 64-graph batch in tens of microseconds.
//
// Inputs are the per-graph arrays concatenated across graphs with local
// (per-graph) indices; outputs are the caller-allocated PackedGraphBatch
// buffers.  Returns 0 on success, -1 on error (message via
// cgr_last_error(), shared with featurizer.cpp).

#include <cstdint>
#include <cstring>
#include <limits>
#include <string>
#include <vector>

// error reporting shared with featurizer.cpp
extern "C" const char* cgr_last_error();
extern "C" void cgr_set_error(const char* msg);

extern "C" int cgr_pack_graphs(
    // spec
    int32_t p, int32_t te, int32_t tn, int32_t tb, int32_t d, int32_t dn,
    // graphs (concatenated, local indices)
    int32_t n_graphs, const int32_t* node_counts, const int32_t* edge_counts,
    const float* node_feats, int32_t n_feat,
    const float* edge_feats, int32_t e_feat,
    const int32_t* senders_in, const int32_t* receivers_in,
    const float* labels_in, const int32_t* row_ids_in,
    // outputs (caller-allocated, pre-filled is NOT required)
    float* node_x, float* edge_attr,
    int32_t* senders, int32_t* receivers, int32_t* rev,
    int32_t* edge_nbr, int32_t* edge_nbr_rev,
    int32_t* node_inc, int32_t* node_out,
    int32_t* graph_of_node, int32_t* graph_nodes,
    float* labels_out, float* graph_mask, int32_t* row_ids_out) {
  const int64_t ET = static_cast<int64_t>(p) * te;
  const int64_t NT = static_cast<int64_t>(p) * tn;
  const int64_t BT = static_cast<int64_t>(p) * tb;

  // initialize outputs to sentinels / zeros
  std::memset(node_x, 0, sizeof(float) * NT * n_feat);
  std::memset(edge_attr, 0, sizeof(float) * ET * e_feat);
  for (int64_t i = 0; i < ET; ++i) {
    senders[i] = static_cast<int32_t>(NT);
    receivers[i] = static_cast<int32_t>(NT);
    rev[i] = static_cast<int32_t>(ET);
  }
  for (int64_t i = 0; i < ET * d; ++i) {
    edge_nbr[i] = static_cast<int32_t>(ET);
    edge_nbr_rev[i] = static_cast<int32_t>(ET);
  }
  for (int64_t i = 0; i < NT * d; ++i) {
    node_inc[i] = static_cast<int32_t>(ET);
    node_out[i] = static_cast<int32_t>(ET);
  }
  for (int64_t i = 0; i < NT; ++i)
    graph_of_node[i] = static_cast<int32_t>(BT);
  for (int64_t i = 0; i < BT * dn; ++i)
    graph_nodes[i] = static_cast<int32_t>(NT);
  std::memset(labels_out, 0, sizeof(float) * BT);
  std::memset(graph_mask, 0, sizeof(float) * BT);
  for (int64_t i = 0; i < BT; ++i) row_ids_out[i] = -1;

  std::vector<int32_t> e_fill(p, 0), n_fill(p, 0), g_fill(p, 0);
  std::vector<int32_t> inc_fill;  // per-graph scratch

  int64_t node_base = 0, edge_base = 0;
  for (int32_t gi = 0; gi < n_graphs; ++gi) {
    const int32_t nn = node_counts[gi];
    const int32_t ne = edge_counts[gi];
    if (ne > te || nn > tn) {
      cgr_set_error("graph exceeds pack tile; increase te/tn");
      return -1;
    }
    if (nn > dn) {
      cgr_set_error("graph has more nodes than dn");
      return -1;
    }
    // best-fit: tightest post-placement edge slack, ties by node slack
    // then lowest index (mirrors data/batch.py's np.argmin first-min)
    int32_t pk = -1;
    int64_t best = std::numeric_limits<int64_t>::max();
    for (int32_t q = 0; q < p; ++q) {
      if (e_fill[q] + ne <= te && n_fill[q] + nn <= tn &&
          g_fill[q] + 1 <= tb) {
        const int64_t key =
            static_cast<int64_t>(te - e_fill[q] - ne) * (tn + 1) +
            (tn - n_fill[q] - nn);
        if (key < best) {
          best = key;
          pk = q;
        }
      }
    }
    if (pk < 0) {
      cgr_set_error("graphs do not fit into the configured packs");
      return -1;
    }
    const int64_t n_off = static_cast<int64_t>(pk) * tn + n_fill[pk];
    const int64_t e_off = static_cast<int64_t>(pk) * te + e_fill[pk];
    const int64_t g_off = static_cast<int64_t>(pk) * tb + g_fill[pk];

    std::memcpy(node_x + n_off * n_feat, node_feats + node_base * n_feat,
                sizeof(float) * nn * n_feat);
    std::memcpy(edge_attr + e_off * e_feat, edge_feats + edge_base * e_feat,
                sizeof(float) * ne * e_feat);

    const int32_t* g_send = senders_in + edge_base;
    const int32_t* g_recv = receivers_in + edge_base;
    for (int32_t e = 0; e < ne; ++e) {
      senders[e_off + e] = static_cast<int32_t>(n_off) + g_send[e];
      receivers[e_off + e] = static_cast<int32_t>(n_off) + g_recv[e];
      rev[e_off + e] = static_cast<int32_t>(e_off) + (e ^ 1);
    }

    // node_inc / node_out (ELL over receivers; rev(e) = e^1)
    inc_fill.assign(nn, 0);
    for (int32_t e = 0; e < ne; ++e) {
      const int32_t r = g_recv[e];
      const int32_t k = inc_fill[r];
      if (k >= d) {
        cgr_set_error("node in-degree exceeds ELL width d");
        return -1;
      }
      node_inc[(n_off + r) * d + k] = static_cast<int32_t>(e_off) + e;
      node_out[(n_off + r) * d + k] =
          static_cast<int32_t>(e_off) + (e ^ 1);
      inc_fill[r] = k + 1;
    }
    // edge_nbr[e] = node_inc[sender(e)]; edge_nbr_rev[e] = node_out[recv(e)]
    for (int32_t e = 0; e < ne; ++e) {
      std::memcpy(edge_nbr + (e_off + e) * d,
                  node_inc + (n_off + g_send[e]) * d, sizeof(int32_t) * d);
      std::memcpy(edge_nbr_rev + (e_off + e) * d,
                  node_out + (n_off + g_recv[e]) * d, sizeof(int32_t) * d);
    }

    for (int32_t v = 0; v < nn; ++v) {
      graph_of_node[n_off + v] = static_cast<int32_t>(g_off);
      graph_nodes[g_off * dn + v] = static_cast<int32_t>(n_off) + v;
    }
    labels_out[g_off] = labels_in[gi];
    graph_mask[g_off] = 1.0f;
    row_ids_out[g_off] = row_ids_in[gi];

    e_fill[pk] += ne;
    n_fill[pk] += nn;
    g_fill[pk] += 1;
    node_base += nn;
    edge_base += ne;
  }
  return 0;
}
