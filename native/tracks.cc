// Track building — BFS over the match graph with the reference's
// one-feature-per-image rule (`ComputeTracks`, src/ComputeTracks.cpp:36-313).
//
// Node space: every (image, key) that participates in a match, sorted by
// (image, key) — the same visitation order as the reference's image-major,
// key-ascending loops.  Adjacency is CSR over nodes (symmetric, one edge
// per neighbor image after PruneDoubleMatches).

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// node_img:   [num_nodes] image id per node (nodes sorted by (img, key)).
// adj_off:    [num_nodes+1] CSR offsets.
// adj_tgt:    [adj_off[num_nodes]] neighbor node ids.
// out_track:  [num_nodes] -> track id or -1.
// Returns the number of tracks (components with >= 2 surviving nodes).
long long build_tracks_bfs(int num_images,
                           long long num_nodes, const int* node_img,
                           const long long* adj_off,
                           const long long* adj_tgt,
                           int* out_track) {
    std::vector<char> visited(num_nodes, 0);
    std::vector<char> img_marked(num_images, 0);
    std::vector<int> touched;
    std::vector<long long> queue;
    std::vector<long long> members;
    touched.reserve(num_images);
    queue.reserve(1024);
    members.reserve(1024);

    for (long long i = 0; i < num_nodes; i++) out_track[i] = -1;

    long long track_id = 0;
    for (long long start = 0; start < num_nodes; start++) {
        if (visited[start]) continue;
        visited[start] = 1;

        for (int t : touched) img_marked[t] = 0;
        touched.clear();
        queue.clear();
        members.clear();

        queue.push_back(start);
        members.push_back(start);
        img_marked[node_img[start]] = 1;
        touched.push_back(node_img[start]);

        size_t head = 0;
        while (head < queue.size()) {
            long long u = queue[head++];
            for (long long e = adj_off[u]; e < adj_off[u + 1]; e++) {
                long long v = adj_tgt[e];
                if (visited[v]) continue;
                int img = node_img[v];
                if (img_marked[img]) continue;  // one feature per image
                visited[v] = 1;
                img_marked[img] = 1;
                touched.push_back(img);
                queue.push_back(v);
                members.push_back(v);
            }
        }

        if (members.size() >= 2) {
            for (long long m : members) out_track[m] = (int) track_id;
            track_id++;
        }
    }
    return track_id;
}

// Same contract as build_tracks_bfs, but takes UNSORTED symmetric edge
// lists and builds the CSR here with a counting sort — the numpy-side
// stable argsort + np.add.at histogram cost ~5 s at 10^7 edges
// (256-image collections); this pass is O(E) and runs in ~0.1 s.
long long build_tracks_edges(int num_images,
                             long long num_nodes, const int* node_img,
                             long long num_edges,
                             const long long* src, const long long* dst,
                             int* out_track) {
    std::vector<long long> off(num_nodes + 2, 0);
    for (long long e = 0; e < num_edges; e++) off[src[e] + 2]++;
    for (long long i = 2; i <= num_nodes + 1; i++) off[i] += off[i - 1];
    std::vector<long long> adj(num_edges);
    for (long long e = 0; e < num_edges; e++) adj[off[src[e] + 1]++] = dst[e];
    // off[u] .. off[u+1] now bound node u's neighbor list.
    return build_tracks_bfs(num_images, num_nodes, node_img,
                            off.data(), adj.data(), out_track);
}

}  // extern "C"
