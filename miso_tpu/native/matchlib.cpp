// Native host event-compiler kernels: CIGAR parsing + read-isoform
// matching.  The TPU-native analogue of the reference C engine's host
// setup path (pysplicing/src/solve.c:8-108 splicing_matchIso,
// :220-306 splicing_parse_cigar), rebuilt as a batch-oriented library:
// one call matches ALL reads of a gene against all isoforms, with
// signature deduplication done in C++.
//
// Exposed with a plain C ABI for ctypes (no pybind11 in this image).
//
// Build: cc -O2 -shared -fPIC matchlib.cpp -o libmisomatch.so
#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <unordered_map>
#include <vector>
#include <string>

namespace {

struct NumCigar {
    std::vector<int64_t> runs;  // + exon-consuming, - intron skip
    int64_t length = 0;         // matched length (clipped)
    bool ok = false;
};

// splicing_parse_cigar semantics (solve.c:220-306): M/=/X/S/H/D consume
// ("match"), N skips, I ignored; totals clipped at max_read_len; S/H only
// at the ends.
bool parse_cigar(const char* s, int64_t max_read_len, NumCigar* out) {
    out->runs.clear();
    out->length = 0;
    int mode = 0;  // 0 begin, 1 middle, 2 end
    while (*s) {
        char* end;
        long long l = strtoll(s, &end, 10);
        if (end == s) return false;
        s = end;
        char op = *s;
        if (!op) return false;
        s++;
        if (mode == 0 && op != 'S' && op != 'H') mode = 1;
        else if (mode == 1 && (op == 'S' || op == 'H')) mode = 2;
        else if (mode == 2 && op != 'S' && op != 'H') return false;
        switch (op) {
            case 'N':
                out->runs.push_back(-l);
                break;
            case 'I':
                break;
            case 'M': case '=': case 'X': case 'S': case 'H': case 'D': {
                if (max_read_len > 0 && out->length + l > max_read_len)
                    l = max_read_len - out->length;
                out->runs.push_back(l);
                out->length += l;
                break;
            }
            default:
                return false;
        }
    }
    out->ok = true;
    return true;
}

// splicing_matchIso walk (solve.c:63-95) for one isoform
double match_one(const int64_t* starts, const int64_t* ends, int64_t nex,
                 int64_t pos, const std::vector<int64_t>& runs) {
    // find exon containing pos (exons sorted by start)
    int64_t lo = 0, hi = nex;
    while (lo < hi) {  // upper_bound on starts
        int64_t mid = (lo + hi) / 2;
        if (starts[mid] <= pos) lo = mid + 1; else hi = mid;
    }
    int64_t ex = lo - 1;
    if (ex < 0 || pos > ends[ex]) return 0.0;
    for (int64_t c : runs) {
        if (c > 0) {
            if (pos + c - 1 > ends[ex]) return 0.0;
            pos += c;
        } else {
            if (pos != ends[ex] + 1) return 0.0;
            pos += -c;
            ex += 1;
            if (ex >= nex || pos != starts[ex]) return 0.0;
        }
    }
    return 1.0;
}

}  // namespace

extern "C" {

// Match all reads against all isoforms.
//   positions:    n_reads genomic start positions (1-based)
//   cigar_buf:    NUL-separated cigar strings, offsets[i] = start of read i
//   exon_starts/ends: flat per-isoform exon arrays; exon_idx[i]..exon_idx[i+1]
//                 delimit isoform i's exons (noiso+1 entries)
//   out_match:    noiso * n_reads doubles, row-major [iso][read]
// Returns 0 on success, -1 on a bad cigar.
int64_t miso_match_iso(
    const int64_t* positions, int64_t n_reads,
    const char* cigar_buf, const int64_t* cigar_offsets,
    const int64_t* exon_starts, const int64_t* exon_ends,
    const int64_t* exon_idx, int64_t noiso,
    int64_t read_len, int64_t overhang,
    double* out_match) {
    if (overhang == 0) overhang = 1;

    // dedup (pos, cigar) signatures
    std::unordered_map<std::string, int64_t> sig_index;
    std::vector<int64_t> read_sig(n_reads);
    std::vector<std::pair<int64_t, const char*>> sigs;
    sig_index.reserve(n_reads * 2);
    for (int64_t r = 0; r < n_reads; r++) {
        const char* cig = cigar_buf + cigar_offsets[r];
        std::string key = std::to_string(positions[r]);
        key += '|';
        key += cig;
        auto it = sig_index.find(key);
        if (it == sig_index.end()) {
            int64_t id = (int64_t)sigs.size();
            sig_index.emplace(std::move(key), id);
            sigs.emplace_back(positions[r], cig);
            read_sig[r] = id;
        } else {
            read_sig[r] = it->second;
        }
    }

    // cigar parse cache by string
    std::unordered_map<std::string, NumCigar> cigar_cache;
    int64_t n_sigs = (int64_t)sigs.size();
    std::vector<double> sig_match((size_t)n_sigs * noiso, 0.0);
    for (int64_t s = 0; s < n_sigs; s++) {
        const char* cig = sigs[s].second;
        auto it = cigar_cache.find(cig);
        if (it == cigar_cache.end()) {
            NumCigar nc;
            if (!parse_cigar(cig, read_len, &nc)) return -1;
            it = cigar_cache.emplace(cig, std::move(nc)).first;
        }
        const NumCigar& nc = it->second;
        // read-length filter (solve.c:55) + overhang filter (solve.c:61)
        if (nc.length < read_len) continue;
        if (nc.runs.empty() || nc.runs.front() < overhang ||
            nc.runs.back() < overhang)
            continue;
        for (int64_t i = 0; i < noiso; i++) {
            const int64_t* st = exon_starts + exon_idx[i];
            const int64_t* en = exon_ends + exon_idx[i];
            int64_t nex = exon_idx[i + 1] - exon_idx[i];
            sig_match[(size_t)s * noiso + i] =
                match_one(st, en, nex, sigs[s].first, nc.runs);
        }
    }

    // scatter back: out_match[iso][read]
    for (int64_t r = 0; r < n_reads; r++) {
        const double* src = &sig_match[(size_t)read_sig[r] * noiso];
        for (int64_t i = 0; i < noiso; i++) {
            out_match[(size_t)i * n_reads + r] = src[i];
        }
    }
    return 0;
}

// Genomic -> isoform coordinates for one isoform (gff.c:1041-1160).
// ipos[j] = -1 when pos falls outside the isoform's exons.
void miso_genomic_to_iso(
    const int64_t* starts, const int64_t* ends, int64_t nex,
    const int64_t* pos, int64_t n, int64_t* ipos) {
    std::vector<int64_t> cum(nex + 1, 0);
    for (int64_t e = 0; e < nex; e++)
        cum[e + 1] = cum[e] + (ends[e] - starts[e] + 1);
    for (int64_t j = 0; j < n; j++) {
        int64_t p = pos[j];
        int64_t lo = 0, hi = nex;
        while (lo < hi) {
            int64_t mid = (lo + hi) / 2;
            if (starts[mid] <= p) lo = mid + 1; else hi = mid;
        }
        int64_t ex = lo - 1;
        if (ex < 0 || p > ends[ex]) { ipos[j] = -1; continue; }
        ipos[j] = cum[ex] + (p - starts[ex]) + 1;
    }
}

}  // extern "C"
