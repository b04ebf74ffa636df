// apex-tpu native I/O: fast G2O / BAL parsers.
//
// The reference parses its formats in Rust with rayon-parallel line
// splitting (apex-io g2o.rs:189-192, bal.rs:49-138); this is the
// equivalent native tier for the TPU framework: a mmap'd, single-pass
// character-level tokenizer exported through a C ABI and loaded via
// ctypes (no pybind11 in this image).
//
// Build: see build.py (g++ -O3 -shared -fPIC).

#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct Mapped {
    const char* data = nullptr;
    size_t size = 0;
    int fd = -1;

    bool open(const char* path) {
        fd = ::open(path, O_RDONLY);
        if (fd < 0) return false;
        struct stat st;
        if (fstat(fd, &st) != 0) { ::close(fd); return false; }
        size = static_cast<size_t>(st.st_size);
        if (size == 0) { data = ""; return true; }
        void* p = mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0);
        if (p == MAP_FAILED) { ::close(fd); return false; }
        data = static_cast<const char*>(p);
        return true;
    }

    ~Mapped() {
        if (data && size) munmap(const_cast<char*>(data), size);
        if (fd >= 0) ::close(fd);
    }
};

struct Cursor {
    const char* p;
    const char* end;

    void skip_ws() {
        while (p < end && (*p == ' ' || *p == '\t' || *p == '\r' || *p == '\n')) ++p;
    }

    void skip_spaces() {
        while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
    }

    void skip_line() {
        while (p < end && *p != '\n') ++p;
        if (p < end) ++p;
    }

    bool next_double(double* out) {
        skip_ws();
        if (p >= end) return false;
        char* stop = nullptr;
        *out = strtod(p, &stop);
        if (stop == p) return false;
        p = stop;
        return true;
    }

    bool next_double_inline(double* out) {
        skip_spaces();
        if (p >= end || *p == '\n') return false;
        char* stop = nullptr;
        *out = strtod(p, &stop);
        if (stop == p) return false;
        p = stop;
        return true;
    }

    // Read the leading token of a line into buf; returns length (0 at EOF).
    size_t token(char* buf, size_t cap) {
        skip_ws();
        size_t n = 0;
        while (p < end && !isspace(static_cast<unsigned char>(*p)) && n + 1 < cap) {
            buf[n++] = *p++;
        }
        buf[n] = 0;
        return n;
    }
};

struct BalData {
    int64_t n_cam = 0, n_pt = 0, n_obs = 0;
    std::vector<double> obs;   // [n_obs * 4]  (cam, pt, x, y)
    std::vector<double> cams;  // [n_cam * 9]
    std::vector<double> pts;   // [n_pt * 3]
    std::string error;
};

struct G2oData {
    std::vector<double> v2;   // [n_v2 * 4]  (id, x, y, th)
    std::vector<double> v3;   // [n_v3 * 8]  (id, x,y,z, qx,qy,qz,qw)
    std::vector<double> e2;   // [n_e2 * 11] (i, j, 3 meas, 6 info)
    std::vector<double> e3;   // [n_e3 * 30] (i, j, 7 meas, 21 info)
    std::string error;
};

bool read_n(Cursor& c, double* dst, int n) {
    for (int i = 0; i < n; ++i) {
        if (!c.next_double_inline(dst + i)) return false;
    }
    return true;
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------- BAL ----

void* bal_open(const char* path, int64_t* n_cam, int64_t* n_pt, int64_t* n_obs) {
    Mapped m;
    if (!m.open(path)) return nullptr;
    Cursor c{m.data, m.data + m.size};

    auto* d = new BalData();
    double a, b, e;
    if (!c.next_double(&a) || !c.next_double(&b) || !c.next_double(&e)) {
        d->error = "bad BAL header";
        *n_cam = *n_pt = *n_obs = -1;
        return d;
    }
    d->n_cam = static_cast<int64_t>(a);
    d->n_pt = static_cast<int64_t>(b);
    d->n_obs = static_cast<int64_t>(e);

    d->obs.resize(static_cast<size_t>(d->n_obs) * 4);
    d->cams.resize(static_cast<size_t>(d->n_cam) * 9);
    d->pts.resize(static_cast<size_t>(d->n_pt) * 3);

    size_t total = d->obs.size() + d->cams.size() + d->pts.size();
    double* dsts[3] = {d->obs.data(), d->cams.data(), d->pts.data()};
    size_t lens[3] = {d->obs.size(), d->cams.size(), d->pts.size()};
    size_t sec = 0, k = 0;
    for (size_t i = 0; i < total; ++i) {
        double v;
        if (!c.next_double(&v)) {
            d->error = "truncated BAL file";
            *n_cam = *n_pt = *n_obs = -1;
            return d;
        }
        dsts[sec][k++] = v;
        if (k == lens[sec]) { ++sec; k = 0; }
    }
    *n_cam = d->n_cam;
    *n_pt = d->n_pt;
    *n_obs = d->n_obs;
    return d;
}

void bal_read(void* handle, double* obs, double* cams, double* pts) {
    auto* d = static_cast<BalData*>(handle);
    memcpy(obs, d->obs.data(), d->obs.size() * sizeof(double));
    memcpy(cams, d->cams.data(), d->cams.size() * sizeof(double));
    memcpy(pts, d->pts.data(), d->pts.size() * sizeof(double));
}

const char* bal_error(void* handle) {
    auto* d = static_cast<BalData*>(handle);
    return d->error.c_str();
}

void bal_close(void* handle) {
    delete static_cast<BalData*>(handle);
}

// ---------------------------------------------------------------- G2O ----

void* g2o_open(const char* path, int64_t* n_v2, int64_t* n_v3, int64_t* n_e2,
               int64_t* n_e3) {
    Mapped m;
    auto* d = new G2oData();
    if (!m.open(path)) {
        d->error = "cannot open file";
        *n_v2 = *n_v3 = *n_e2 = *n_e3 = -1;
        return d;
    }
    Cursor c{m.data, m.data + m.size};
    char tag[64];

    while (true) {
        size_t n = c.token(tag, sizeof(tag));
        if (n == 0) break;
        if (tag[0] == '#') { c.skip_line(); continue; }
        if (strcmp(tag, "VERTEX_SE2") == 0) {
            double row[4];
            if (!read_n(c, row, 4)) { d->error = "malformed VERTEX_SE2"; break; }
            d->v2.insert(d->v2.end(), row, row + 4);
        } else if (strcmp(tag, "VERTEX_SE3:QUAT") == 0) {
            double row[8];
            if (!read_n(c, row, 8)) { d->error = "malformed VERTEX_SE3:QUAT"; break; }
            d->v3.insert(d->v3.end(), row, row + 8);
        } else if (strcmp(tag, "EDGE_SE2") == 0) {
            double row[11];
            if (!read_n(c, row, 11)) { d->error = "malformed EDGE_SE2"; break; }
            d->e2.insert(d->e2.end(), row, row + 11);
        } else if (strcmp(tag, "EDGE_SE3:QUAT") == 0) {
            double row[30];
            if (!read_n(c, row, 30)) { d->error = "malformed EDGE_SE3:QUAT"; break; }
            d->e3.insert(d->e3.end(), row, row + 30);
        } else {
            c.skip_line();  // unknown tag: skip (matches Python loader)
            continue;
        }
        c.skip_line();
    }

    if (!d->error.empty()) {
        *n_v2 = *n_v3 = *n_e2 = *n_e3 = -1;
        return d;
    }
    *n_v2 = static_cast<int64_t>(d->v2.size() / 4);
    *n_v3 = static_cast<int64_t>(d->v3.size() / 8);
    *n_e2 = static_cast<int64_t>(d->e2.size() / 11);
    *n_e3 = static_cast<int64_t>(d->e3.size() / 30);
    return d;
}

void g2o_read(void* handle, double* v2, double* v3, double* e2, double* e3) {
    auto* d = static_cast<G2oData*>(handle);
    memcpy(v2, d->v2.data(), d->v2.size() * sizeof(double));
    memcpy(v3, d->v3.data(), d->v3.size() * sizeof(double));
    memcpy(e2, d->e2.data(), d->e2.size() * sizeof(double));
    memcpy(e3, d->e3.data(), d->e3.size() * sizeof(double));
}

const char* g2o_error(void* handle) {
    return static_cast<G2oData*>(handle)->error.c_str();
}

void g2o_close(void* handle) {
    delete static_cast<G2oData*>(handle);
}

}  // extern "C"
