// Native host-side data plane: PDB / SDF text -> flat numeric arrays.
//
// The reference offloads its host chemistry to native dependencies
// (RDKit/OpenBabel/Biopython — SURVEY top-level facts); this framework's
// host pipeline is pure python with this C++ fast path for the text-heavy
// part: scanning PDB ATOM/HETATM records and SDF V2000 blocks. At
// CrossDocked scale (~100k complexes) parsing dominates first-epoch cost;
// this parser is ~20-50x the python one (see tests/test_native.py bench).
//
// Interface: plain C ABI consumed via ctypes (no pybind11 in the image).
// The python wrapper (cbgbench_tpu/native/__init__.py) compiles this file
// on first use with g++ and falls back to the pure-python parsers when a
// toolchain is unavailable.

#include <cstring>
#include <cstdlib>
#include <cstdio>

namespace {

inline bool starts_with(const char* line, const char* pre, int len) {
    return std::strncmp(line, pre, len) == 0;
}

// element symbol -> atomic number (heavy atoms the pipeline keeps + H for
// skipping; mirrors chem/pdb.py _ELEMENT_Z)
int element_z(const char* s, int n) {
    // trim
    while (n > 0 && (s[0] == ' ')) { ++s; --n; }
    while (n > 0 && (s[n - 1] == ' ' || s[n - 1] == '\n' || s[n-1] == '\r'))
        --n;
    if (n <= 0) return 0;
    char a = s[0] >= 'a' ? s[0] - 32 : s[0];
    char b = n > 1 ? (s[1] >= 'A' && s[1] <= 'Z' ? s[1] + 32 : s[1]) : 0;
    if (n == 1) {
        switch (a) {
            case 'H': return 1; case 'C': return 6; case 'N': return 7;
            case 'O': return 8; case 'S': return 16; case 'P': return 15;
            case 'F': return 9; case 'B': return 5; case 'I': return 53;
            case 'K': return 19;
        }
        return 0;
    }
    if (a == 'S' && b == 'E') return 34;
    if (a == 'C' && b == 'L') return 17;
    if (a == 'B' && b == 'R') return 35;
    if (a == 'Z' && b == 'N') return 30;
    if (a == 'M' && b == 'G') return 12;
    if (a == 'F' && b == 'E') return 26;
    if (a == 'C' && b == 'A') return 20;
    if (a == 'M' && b == 'N') return 25;
    if (a == 'N' && b == 'A') return 11;
    if (a == 'C' && b == 'U') return 29;
    // fall back to first letter
    switch (a) {
        case 'H': return 1; case 'C': return 6; case 'N': return 7;
        case 'O': return 8; case 'S': return 16; case 'P': return 15;
    }
    return 0;
}

inline float parse_f(const char* s, int n) {
    char buf[24];
    if (n > 23) n = 23;
    std::memcpy(buf, s, n);
    buf[n] = 0;
    return static_cast<float>(std::atof(buf));
}

}  // namespace

extern "C" {

// Parse ATOM/HETATM heavy-atom records.
// Outputs (caller-allocated, capacity max_atoms):
//   z[i] int32, pos[3i..] float32, is_bb[i] uint8,
//   names[4i..] char (atom name, space padded),
//   resnames[4i..] char (residue name, space padded),
//   reskey[i] int32 (ordinal of the (chain, resseq, icode, resname) group,
//                    in first-appearance order — matches the python parser)
// Returns atom count, or -1 on overflow.
int parse_pdb_atoms(const char* text, long text_len, int max_atoms,
                    int* z, float* pos, unsigned char* is_bb,
                    char* names, char* resnames, int* reskey,
                    char* chains, int* resseq) {
    int count = 0;
    // residue grouping: linear scan table of seen keys (chain+resseq+icode
    // +resname packed into 12 bytes)
    static const int MAXRES = 16384;
    char* keys = static_cast<char*>(std::malloc(MAXRES * 12));
    int n_res = 0;
    const char* p = text;
    const char* end = text + text_len;
    while (p < end) {
        const char* nl = static_cast<const char*>(
            std::memchr(p, '\n', end - p));
        long len = nl ? nl - p : end - p;
        if (len >= 54 && (starts_with(p, "ATOM", 4)
                          || starts_with(p, "HETATM", 6))) {
            char altloc = p[16];
            if (altloc == ' ' || altloc == 'A') {
                int zi = 0;
                if (len >= 78) zi = element_z(p + 76, 2);
                if (zi == 0) zi = element_z(p + 12, 2) ? element_z(p + 12, 2)
                                                       : element_z(p + 13, 1);
                if (zi > 1) {           // skip H and unknown, like python
                    if (count >= max_atoms) { std::free(keys); return -1; }
                    z[count] = zi;
                    pos[3 * count + 0] = parse_f(p + 30, 8);
                    pos[3 * count + 1] = parse_f(p + 38, 8);
                    pos[3 * count + 2] = parse_f(p + 46, 8);
                    // atom name cols 12-16
                    std::memcpy(names + 4 * count, p + 12, 4);
                    // residue name cols 17-20 (3 chars + pad)
                    std::memcpy(resnames + 4 * count, p + 17, 3);
                    resnames[4 * count + 3] = ' ';
                    // backbone flag: name in {N, CA, C, O}
                    char nm[5] = {0, 0, 0, 0, 0};
                    int m = 0;
                    for (int t = 12; t < 16; ++t)
                        if (p[t] != ' ') nm[m++] = p[t];
                    is_bb[count] =
                        (std::strcmp(nm, "N") == 0 || std::strcmp(nm, "CA") == 0
                         || std::strcmp(nm, "C") == 0
                         || std::strcmp(nm, "O") == 0);
                    // residue key: chain(21) + resseq(22-26) + icode(26)
                    char key[12];
                    std::memset(key, 0, 12);
                    key[0] = p[21];
                    std::memcpy(key + 1, p + 22, 5);
                    std::memcpy(key + 6, p + 17, 3);
                    int rid = -1;
                    for (int r = n_res - 1; r >= 0; --r) {
                        if (std::memcmp(keys + 12 * r, key, 12) == 0) {
                            rid = r;
                            break;
                        }
                    }
                    if (rid < 0) {
                        if (n_res >= MAXRES) { std::free(keys); return -1; }
                        std::memcpy(keys + 12 * n_res, key, 12);
                        rid = n_res++;
                    }
                    reskey[count] = rid;
                    chains[count] = p[21];
                    {
                        char rs[6] = {p[22], p[23], p[24], p[25], 0, 0};
                        resseq[count] = std::atoi(rs);
                    }
                    ++count;
                }
            }
        }
        if (!nl) break;
        p = nl + 1;
    }
    std::free(keys);
    return count;
}

// Parse the first molecule of an SDF (V2000).
// Outputs: z[i], pos[3i..], arom[i] (0 placeholder), bonds[3e..] =
// (i, j, order) 0-based. Returns n_atoms in *na_out, n_bonds in *nb_out;
// 0 on success, negative on malformed input / overflow.
int parse_sdf_v2000(const char* text, long text_len, int max_atoms,
                    int max_bonds, int* z, float* pos, int* bonds,
                    int* na_out, int* nb_out) {
    const char* p = text;
    const char* end = text + text_len;
    // skip 3 header lines
    for (int i = 0; i < 3; ++i) {
        const char* nl = static_cast<const char*>(
            std::memchr(p, '\n', end - p));
        if (!nl) return -1;
        p = nl + 1;
    }
    const char* nl = static_cast<const char*>(std::memchr(p, '\n', end - p));
    if (!nl || nl - p < 6) return -2;
    char buf[4] = {p[0], p[1], p[2], 0};
    int na = std::atoi(buf);
    buf[0] = p[3]; buf[1] = p[4]; buf[2] = p[5];
    int nb = std::atoi(buf);
    if (na <= 0 || na > max_atoms || nb < 0 || nb > max_bonds) return -3;
    p = nl + 1;
    for (int i = 0; i < na; ++i) {
        nl = static_cast<const char*>(std::memchr(p, '\n', end - p));
        long len = nl ? nl - p : end - p;
        if (len < 34) return -4;
        pos[3 * i + 0] = parse_f(p + 0, 10);
        pos[3 * i + 1] = parse_f(p + 10, 10);
        pos[3 * i + 2] = parse_f(p + 20, 10);
        z[i] = element_z(p + 31, 3);
        if (!nl) return (i == na - 1 && nb == 0) ? (*na_out = na,
                                                    *nb_out = 0, 0) : -5;
        p = nl + 1;
    }
    for (int e = 0; e < nb; ++e) {
        nl = static_cast<const char*>(std::memchr(p, '\n', end - p));
        long len = nl ? nl - p : end - p;
        if (len < 9) return -6;
        char b1[4] = {p[0], p[1], p[2], 0};
        char b2[4] = {p[3], p[4], p[5], 0};
        char b3[4] = {p[6], p[7], p[8], 0};
        bonds[3 * e + 0] = std::atoi(b1) - 1;
        bonds[3 * e + 1] = std::atoi(b2) - 1;
        bonds[3 * e + 2] = std::atoi(b3);
        if (bonds[3 * e] < 0 || bonds[3 * e + 1] < 0
            || bonds[3 * e] >= na || bonds[3 * e + 1] >= na) return -7;
        if (!nl) { if (e != nb - 1) return -8; p = end; break; }
        p = nl + 1;
    }
    *na_out = na;
    *nb_out = nb;
    return 0;
}

// Distance + valence bond perception (mirrors chem/bonds.py
// perceive_bonds steps 1-3; order assignment stays in python where the
// ring machinery lives). Returns bond count, or -1 on overflow.
int perceive_bonds_c(int n, const int* z, const double* pos, double tol,
                     int max_bonds, int* out_i, int* out_j) {
    if (n < 2) return 0;
    // covalent radii (constants/molecule.py COVALENT_RADII subset)
    auto rad = [](int a) -> double {
        switch (a) {
            case 1: return 0.31; case 5: return 0.84; case 6: return 0.76;
            case 7: return 0.71; case 8: return 0.66; case 9: return 0.57;
            case 14: return 1.11; case 15: return 1.07; case 16: return 1.05;
            case 17: return 1.02; case 34: return 1.20; case 35: return 1.20;
            case 53: return 1.39;
        }
        return 0.77;
    };
    auto maxv = [](int a) -> int {
        switch (a) {
            case 1: return 1; case 5: return 3; case 6: return 4;
            case 7: return 3; case 8: return 2; case 9: return 1;
            case 15: return 5; case 16: return 6; case 17: return 1;
            case 35: return 1; case 53: return 1;
        }
        return 4;
    };
    int ncand = 0;
    int cap = n * 8;
    double* cd = static_cast<double*>(std::malloc(sizeof(double) * cap));
    int* ci = static_cast<int*>(std::malloc(sizeof(int) * cap));
    int* cj = static_cast<int*>(std::malloc(sizeof(int) * cap));
    for (int i = 0; i < n; ++i) {
        for (int j = i + 1; j < n; ++j) {
            double dx = pos[3 * i] - pos[3 * j];
            double dy = pos[3 * i + 1] - pos[3 * j + 1];
            double dz = pos[3 * i + 2] - pos[3 * j + 2];
            double d2 = dx * dx + dy * dy + dz * dz;
            double cut = rad(z[i]) + rad(z[j]) + tol;
            if (d2 < cut * cut && d2 > 0.16) {
                if (ncand >= cap) {
                    cap *= 2;
                    cd = static_cast<double*>(
                        std::realloc(cd, sizeof(double) * cap));
                    ci = static_cast<int*>(
                        std::realloc(ci, sizeof(int) * cap));
                    cj = static_cast<int*>(
                        std::realloc(cj, sizeof(int) * cap));
                }
                cd[ncand] = d2;
                ci[ncand] = i;
                cj[ncand] = j;
                ++ncand;
            }
        }
    }
    // insertion sort by distance (candidate lists are small)
    for (int a = 1; a < ncand; ++a) {
        double dv = cd[a]; int iv = ci[a]; int jv = cj[a];
        int b = a - 1;
        while (b >= 0 && cd[b] > dv) {
            cd[b + 1] = cd[b]; ci[b + 1] = ci[b]; cj[b + 1] = cj[b];
            --b;
        }
        cd[b + 1] = dv; ci[b + 1] = iv; cj[b + 1] = jv;
    }
    int* deg = static_cast<int*>(std::calloc(n, sizeof(int)));
    int nb = 0;
    for (int a = 0; a < ncand; ++a) {
        int i = ci[a], j = cj[a];
        if (deg[i] < maxv(z[i]) && deg[j] < maxv(z[j])) {
            if (nb >= max_bonds) { nb = -1; break; }
            out_i[nb] = i;
            out_j[nb] = j;
            ++deg[i];
            ++deg[j];
            ++nb;
        }
    }
    std::free(cd); std::free(ci); std::free(cj); std::free(deg);
    return nb;
}

}  // extern "C"
