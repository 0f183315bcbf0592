// Native Newick emitter: the CSR DFS of dipper_tpu/io/newick.py
// edge_arrays_newick, at C speed (the Python stack walk is ~10 s at
// N=1M — the kind of finalization cost that erases a phase win).
//
// Inputs are the CSR adjacency the Python side already builds
// vectorized (argsort-by-source): starts [M+1], dst/ln [Eok], plus the
// leaf/internal names as one packed blob with offsets. Output is a
// malloc'd string the caller frees via newick_free.
//
// Branch lengths print as printf "%.6g" — identical bytes to Python's
// f"{x:.6g}" (both follow C %g semantics with correctly-rounded
// conversions), asserted by tests/test_newick.py.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

extern "C" {

// returns length of the emitted string; *out receives a malloc'd
// buffer (not NUL-terminated usage-wise, but we NUL-terminate anyway)
int64_t newick_emit(const int64_t *starts, int64_t n_nodes,
                    const int64_t *dst, const double *ln,
                    const char *name_blob, const int64_t *name_off,
                    int64_t root, char **out) {
    std::string s;
    s.reserve(static_cast<size_t>(n_nodes) * 24 + 64);

    struct Frame {
        int64_t node, parent;
        int64_t pos, end;   // current scan position in [starts[n], starts[n+1])
        int64_t emitted;    // children emitted so far
        int64_t last_slot;  // slot of the child just returned from
    };
    std::vector<Frame> stack;
    stack.push_back({root, -1, starts[root], starts[root + 1], 0, -1});

    char buf[64];
    // first visit: does the node have any non-parent neighbor?
    {
        Frame &f = stack.back();
        bool has = false;
        for (int64_t i = f.pos; i < f.end; i++)
            if (dst[i] != f.parent) { has = true; break; }
        if (!has) {
            s.append(name_blob + name_off[root],
                     name_off[root + 1] - name_off[root]);
            s.push_back(';');
            *out = static_cast<char *>(malloc(s.size() + 1));
            memcpy(*out, s.data(), s.size() + 1);
            return static_cast<int64_t>(s.size());
        }
        s.push_back('(');
    }

    while (!stack.empty()) {
        Frame &f = stack.back();
        if (f.last_slot >= 0) {
            // just returned from a child: emit its branch length and
            // the separator/closer
            s.push_back(':');
            int nlen = snprintf(buf, sizeof buf, "%.6g", ln[f.last_slot]);
            s.append(buf, nlen);
            f.last_slot = -1;
            // peek: any further child?
            int64_t nxt = f.pos;
            while (nxt < f.end && dst[nxt] == f.parent) nxt++;
            s.push_back(nxt < f.end ? ',' : ')');
            if (nxt >= f.end) {
                stack.pop_back();
                continue;
            }
        }
        // advance to the next child slot
        while (f.pos < f.end && dst[f.pos] == f.parent) f.pos++;
        if (f.pos >= f.end) {  // no children at all handled at push time
            stack.pop_back();
            continue;
        }
        int64_t slot = f.pos++;
        int64_t child = dst[slot];
        f.emitted++;
        f.last_slot = slot;
        // descend: leaf prints its name, internal pushes a frame
        bool has = false;
        for (int64_t i = starts[child]; i < starts[child + 1]; i++)
            if (dst[i] != f.node) { has = true; break; }
        if (!has) {
            s.append(name_blob + name_off[child],
                     name_off[child + 1] - name_off[child]);
        } else {
            s.push_back('(');
            stack.push_back({child, f.node, starts[child],
                             starts[child + 1], 0, -1});
        }
    }
    s.push_back(';');
    *out = static_cast<char *>(malloc(s.size() + 1));
    memcpy(*out, s.data(), s.size() + 1);
    return static_cast<int64_t>(s.size());
}

void newick_free(char *p) { free(p); }

}  // extern "C"
