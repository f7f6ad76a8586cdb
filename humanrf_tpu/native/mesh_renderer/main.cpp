// Offscreen mesh renderer: OBJ animation -> per-camera masks and depth maps.
//
// Native (host C++) replacement for the reference's OpenGL/Pangolin renderer
// (/root/reference/actorshq/toolbox/mesh_tools/renderer/main.cpp) with the same
// CLI surface and output layout:
//   <output>/masks/<Cam>/<Cam>_mask%06d.png    (0/255 coverage)
//   <output>/depths/<Cam>/<Cam>_depth%06d.pfm  (camera-space z, float32)
// Differences by design: a dependency-free software rasterizer (no GL/EGL
// needed on TPU hosts); depth is written as PFM instead of EXR (OpenEXR is not
// vendored). Cameras follow the RDF convention of camera.py: world = R c + t,
// pixel = K [R|t]^-1 world.
//
// Build: see CMakeLists.txt (plain C++17, no external deps).

#include <algorithm>
#include <array>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <filesystem>
#include <fstream>
#include <iostream>
#include <limits>
#include <map>
#include <set>
#include <sstream>
#include <string>
#include <thread>
#include <vector>

namespace fs = std::filesystem;

struct Vec3 {
    float x = 0, y = 0, z = 0;
};

struct Mat3 {
    // Row-major.
    float m[9] = {1, 0, 0, 0, 1, 0, 0, 0, 1};

    Vec3 mul(const Vec3& v) const {
        return {m[0] * v.x + m[1] * v.y + m[2] * v.z,
                m[3] * v.x + m[4] * v.y + m[5] * v.z,
                m[6] * v.x + m[7] * v.y + m[8] * v.z};
    }
    Mat3 transposed() const {
        Mat3 r;
        for (int i = 0; i < 3; ++i)
            for (int j = 0; j < 3; ++j) r.m[i * 3 + j] = m[j * 3 + i];
        return r;
    }
};

// Axis-angle -> rotation matrix (Rodrigues), matching scipy's from_rotvec.
Mat3 rotation_from_axisangle(float rx, float ry, float rz) {
    float theta = std::sqrt(rx * rx + ry * ry + rz * rz);
    Mat3 r;
    if (theta < 1e-12f) return r;
    float kx = rx / theta, ky = ry / theta, kz = rz / theta;
    float c = std::cos(theta), s = std::sin(theta), ic = 1.0f - c;
    r.m[0] = c + kx * kx * ic;      r.m[1] = kx * ky * ic - kz * s; r.m[2] = kx * kz * ic + ky * s;
    r.m[3] = ky * kx * ic + kz * s; r.m[4] = c + ky * ky * ic;      r.m[5] = ky * kz * ic - kx * s;
    r.m[6] = kz * kx * ic - ky * s; r.m[7] = kz * ky * ic + kx * s; r.m[8] = c + kz * kz * ic;
    return r;
}

struct Camera {
    std::string name;
    int width = 0, height = 0;
    Mat3 rot_cam2world;
    Vec3 translation;
    float fx = 0, fy = 0, cx = 0, cy = 0;  // normalized intrinsics
};

std::vector<Camera> read_calibration_csv(const fs::path& path) {
    std::ifstream f(path);
    if (!f) throw std::runtime_error("cannot open calibration csv: " + path.string());
    std::string line;
    std::getline(f, line);  // header: name,w,h,rx,ry,rz,tx,ty,tz,fx,fy,px,py
    std::vector<Camera> cams;
    while (std::getline(f, line)) {
        if (line.empty()) continue;
        std::stringstream ss(line);
        std::string tok;
        std::vector<std::string> cols;
        while (std::getline(ss, tok, ',')) cols.push_back(tok);
        if (cols.size() < 13) continue;
        Camera c;
        c.name = cols[0];
        c.width = std::stoi(cols[1]);
        c.height = std::stoi(cols[2]);
        c.rot_cam2world = rotation_from_axisangle(std::stof(cols[3]), std::stof(cols[4]), std::stof(cols[5]));
        c.translation = {std::stof(cols[6]), std::stof(cols[7]), std::stof(cols[8])};
        c.fx = std::stof(cols[9]);
        c.fy = std::stof(cols[10]);
        c.cx = std::stof(cols[11]);
        c.cy = std::stof(cols[12]);
        cams.push_back(c);
    }
    return cams;
}

struct Mesh {
    std::vector<Vec3> vertices;
    std::vector<std::array<int, 3>> faces;
};

Mesh load_obj(const fs::path& path) {
    std::ifstream f(path);
    if (!f) throw std::runtime_error("cannot open obj: " + path.string());
    Mesh mesh;
    std::string line;
    while (std::getline(f, line)) {
        if (line.size() < 2) continue;
        if (line[0] == 'v' && line[1] == ' ') {
            Vec3 v;
            std::sscanf(line.c_str() + 2, "%f %f %f", &v.x, &v.y, &v.z);
            mesh.vertices.push_back(v);
        } else if (line[0] == 'f' && line[1] == ' ') {
            // Faces may be "f a b c", "f a/t b/t c/t", "f a/t/n ..."; fan-triangulate polygons.
            std::stringstream ss(line.substr(2));
            std::vector<int> idx;
            std::string part;
            while (ss >> part) {
                int vi = std::stoi(part.substr(0, part.find('/')));
                if (vi < 0) vi = static_cast<int>(mesh.vertices.size()) + vi + 1;
                idx.push_back(vi - 1);
            }
            for (size_t k = 2; k < idx.size(); ++k)
                mesh.faces.push_back({idx[0], static_cast<int>(idx[k - 1]), static_cast<int>(idx[k])});
        }
    }
    return mesh;
}

// ------------------------------------------------------------------ PNG (8-bit gray)

static uint32_t crc_table_entry(uint32_t n) {
    uint32_t c = n;
    for (int k = 0; k < 8; ++k) c = (c & 1) ? 0xedb88320u ^ (c >> 1) : c >> 1;
    return c;
}

static uint32_t crc32buf(const uint8_t* buf, size_t len, uint32_t crc = 0xffffffffu) {
    static uint32_t table[256];
    static bool init = false;
    if (!init) {
        for (uint32_t n = 0; n < 256; ++n) table[n] = crc_table_entry(n);
        init = true;
    }
    for (size_t i = 0; i < len; ++i) crc = table[(crc ^ buf[i]) & 0xff] ^ (crc >> 8);
    return crc;
}

static void put_be32(std::vector<uint8_t>& v, uint32_t x) {
    v.push_back(x >> 24); v.push_back(x >> 16); v.push_back(x >> 8); v.push_back(x);
}

static void png_chunk(std::ofstream& f, const char type[4], const std::vector<uint8_t>& data) {
    std::vector<uint8_t> hdr;
    put_be32(hdr, static_cast<uint32_t>(data.size()));
    f.write(reinterpret_cast<const char*>(hdr.data()), 4);
    std::vector<uint8_t> body(type, type + 4);
    body.insert(body.end(), data.begin(), data.end());
    f.write(reinterpret_cast<const char*>(body.data()), body.size());
    uint32_t crc = crc32buf(body.data(), body.size()) ^ 0xffffffffu;
    std::vector<uint8_t> tail;
    put_be32(tail, crc);
    f.write(reinterpret_cast<const char*>(tail.data()), 4);
}

// Minimal zlib stream using "stored" (uncompressed) deflate blocks.
static std::vector<uint8_t> zlib_stored(const std::vector<uint8_t>& raw) {
    std::vector<uint8_t> out;
    out.push_back(0x78); out.push_back(0x01);  // zlib header
    size_t pos = 0;
    while (pos < raw.size()) {
        size_t n = std::min<size_t>(65535, raw.size() - pos);
        bool last = pos + n >= raw.size();
        out.push_back(last ? 1 : 0);
        out.push_back(n & 0xff); out.push_back(n >> 8);
        out.push_back(~n & 0xff); out.push_back((~n >> 8) & 0xff);
        out.insert(out.end(), raw.begin() + pos, raw.begin() + pos + n);
        pos += n;
    }
    // adler32
    uint32_t a = 1, b = 0;
    for (uint8_t byte : raw) { a = (a + byte) % 65521; b = (b + a) % 65521; }
    put_be32(out, (b << 16) | a);
    return out;
}

void write_gray_png(const fs::path& path, const std::vector<uint8_t>& pixels, int w, int h) {
    std::ofstream f(path, std::ios::binary);
    const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
    f.write(reinterpret_cast<const char*>(sig), 8);
    std::vector<uint8_t> ihdr;
    put_be32(ihdr, w); put_be32(ihdr, h);
    ihdr.push_back(8);  // bit depth
    ihdr.push_back(0);  // grayscale
    ihdr.push_back(0); ihdr.push_back(0); ihdr.push_back(0);
    png_chunk(f, "IHDR", ihdr);
    std::vector<uint8_t> raw;
    raw.reserve((w + 1) * h);
    for (int y = 0; y < h; ++y) {
        raw.push_back(0);  // filter: none
        raw.insert(raw.end(), pixels.begin() + static_cast<size_t>(y) * w,
                   pixels.begin() + static_cast<size_t>(y + 1) * w);
    }
    png_chunk(f, "IDAT", zlib_stored(raw));
    png_chunk(f, "IEND", {});
}

void write_pfm(const fs::path& path, const std::vector<float>& depth, int w, int h) {
    std::ofstream f(path, std::ios::binary);
    f << "Pf\n" << w << " " << h << "\n-1.0\n";  // -1.0: little-endian
    // PFM stores rows bottom-to-top.
    for (int y = h - 1; y >= 0; --y)
        f.write(reinterpret_cast<const char*>(depth.data() + static_cast<size_t>(y) * w),
                static_cast<std::streamsize>(w) * sizeof(float));
}

// ------------------------------------------------------------------ rasterizer

void render_camera(const Camera& cam, const Mesh& mesh, float scale,
                   std::vector<uint8_t>& mask, std::vector<float>& depth) {
    const int W = cam.width, H = cam.height;
    mask.assign(static_cast<size_t>(W) * H, 0);
    depth.assign(static_cast<size_t>(W) * H, 0.0f);
    std::vector<float> zbuf(static_cast<size_t>(W) * H, std::numeric_limits<float>::infinity());

    Mat3 world2cam = cam.rot_cam2world.transposed();
    const float fx = cam.fx * W, fy = cam.fy * H, cx = cam.cx * W, cy = cam.cy * H;

    // Transform vertices to camera space + project.
    const size_t nv = mesh.vertices.size();
    std::vector<Vec3> camv(nv);
    std::vector<float> px(nv), py(nv);
    for (size_t i = 0; i < nv; ++i) {
        Vec3 w{mesh.vertices[i].x * scale, mesh.vertices[i].y * scale, mesh.vertices[i].z * scale};
        Vec3 rel{w.x - cam.translation.x, w.y - cam.translation.y, w.z - cam.translation.z};
        camv[i] = world2cam.mul(rel);
        if (camv[i].z > 1e-6f) {
            px[i] = fx * camv[i].x / camv[i].z + cx;
            py[i] = fy * camv[i].y / camv[i].z + cy;
        }
    }

    for (const auto& face : mesh.faces) {
        const int a = face[0], b = face[1], c = face[2];
        if (camv[a].z <= 1e-6f || camv[b].z <= 1e-6f || camv[c].z <= 1e-6f) continue;  // near-clip whole tri
        float x0 = px[a], y0 = py[a], x1 = px[b], y1 = py[b], x2 = px[c], y2 = py[c];
        int minx = std::max(0, static_cast<int>(std::floor(std::min({x0, x1, x2}))));
        int maxx = std::min(W - 1, static_cast<int>(std::ceil(std::max({x0, x1, x2}))));
        int miny = std::max(0, static_cast<int>(std::floor(std::min({y0, y1, y2}))));
        int maxy = std::min(H - 1, static_cast<int>(std::ceil(std::max({y0, y1, y2}))));
        if (minx > maxx || miny > maxy) continue;

        float area = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0);
        if (std::fabs(area) < 1e-12f) continue;
        float inv_area = 1.0f / area;
        // Perspective-correct: interpolate 1/z.
        float iz0 = 1.0f / camv[a].z, iz1 = 1.0f / camv[b].z, iz2 = 1.0f / camv[c].z;

        for (int y = miny; y <= maxy; ++y) {
            for (int x = minx; x <= maxx; ++x) {
                float pxc = x + 0.5f, pyc = y + 0.5f;
                float w0 = ((x1 - pxc) * (y2 - pyc) - (x2 - pxc) * (y1 - pyc)) * inv_area;
                float w1 = ((x2 - pxc) * (y0 - pyc) - (x0 - pxc) * (y2 - pyc)) * inv_area;
                float w2 = 1.0f - w0 - w1;
                if (w0 < 0 || w1 < 0 || w2 < 0) continue;
                float iz = w0 * iz0 + w1 * iz1 + w2 * iz2;
                float z = 1.0f / iz;
                size_t pix = static_cast<size_t>(y) * W + x;
                if (z < zbuf[pix]) {
                    zbuf[pix] = z;
                    mask[pix] = 255;
                    depth[pix] = z;
                }
            }
        }
    }
}

// ------------------------------------------------------------------ CLI

int main(int argc, char** argv) {
    std::vector<std::string> mesh_files;
    std::string path_calibration, output_folder;
    bool render_depth = false, render_mask = false, headless = false;
    float scale = 1.0f;
    std::set<std::string> camera_names;
    std::set<int> frame_ids;

    for (int i = 1; i < argc; ++i) {
        std::string arg = argv[i];
        auto next_vals = [&](auto push) {
            while (i + 1 < argc && argv[i + 1][0] != '-') push(std::string(argv[++i]));
        };
        if (arg == "--objs") next_vals([&](const std::string& s) { mesh_files.push_back(s); });
        else if (arg == "--csv") path_calibration = argv[++i];
        else if (arg == "--output") output_folder = argv[++i];
        else if (arg == "--depth") render_depth = true;
        else if (arg == "--mask") render_mask = true;
        else if (arg == "--headless") headless = true;  // accepted; software renderer is always headless
        else if (arg == "--scale") scale = std::stof(argv[++i]);
        else if (arg == "--cameras") next_vals([&](const std::string& s) { camera_names.insert(s); });
        else if (arg == "--frames") next_vals([&](const std::string& s) { frame_ids.insert(std::stoi(s)); });
        else if (arg == "--alembic") {
            std::cerr << "--alembic requires the Alembic library; extract to OBJs first "
                         "(see alembic_extractor) and use --objs.\n";
            return 2;
        } else {
            std::cerr << "unknown argument: " << arg << "\n";
            return 2;
        }
    }
    (void)headless;
    if (path_calibration.empty() || output_folder.empty() || mesh_files.empty()) {
        std::cerr << "usage: mesh_renderer --objs <f1.obj> [f2.obj ...] --csv calibration.csv "
                     "--output <dir> [--mask] [--depth] [--scale S] [--cameras Cam001 ...] "
                     "[--frames 0 1 ...]\n";
        return 2;
    }
    if (!render_depth && !render_mask) {
        std::cerr << "nothing to do: pass --mask and/or --depth\n";
        return 2;
    }

    std::vector<Camera> cameras = read_calibration_csv(path_calibration);
    if (!camera_names.empty()) {
        cameras.erase(std::remove_if(cameras.begin(), cameras.end(),
                                     [&](const Camera& c) { return camera_names.count(c.name) == 0; }),
                      cameras.end());
    }

    std::sort(mesh_files.begin(), mesh_files.end());
    for (size_t frame = 0; frame < mesh_files.size(); ++frame) {
        if (!frame_ids.empty() && frame_ids.count(static_cast<int>(frame)) == 0) continue;
        Mesh mesh = load_obj(mesh_files[frame]);
        std::cout << "Rendering animation at frame: " << frame << " (" << mesh.faces.size()
                  << " tris)" << std::endl;

        std::vector<std::thread> workers;
        const unsigned n_threads = std::max(1u, std::thread::hardware_concurrency());
        std::vector<const Camera*> todo;
        for (const Camera& cam : cameras) todo.push_back(&cam);

        std::atomic<size_t> next{0};
        auto work = [&]() {
            std::vector<uint8_t> mask;
            std::vector<float> depth;
            for (size_t j = next.fetch_add(1); j < todo.size(); j = next.fetch_add(1)) {
                const Camera& cam = *todo[j];
                render_camera(cam, mesh, scale, mask, depth);
                char idx[16];
                std::snprintf(idx, sizeof(idx), "%06zu", frame);
                if (render_mask) {
                    fs::path p = fs::path(output_folder) / "masks" / cam.name /
                                 (cam.name + "_mask" + idx + ".png");
                    fs::create_directories(p.parent_path());
                    write_gray_png(p, mask, cam.width, cam.height);
                }
                if (render_depth) {
                    fs::path p = fs::path(output_folder) / "depths" / cam.name /
                                 (cam.name + "_depth" + idx + ".pfm");
                    fs::create_directories(p.parent_path());
                    write_pfm(p, depth, cam.width, cam.height);
                }
            }
        };
        for (unsigned t = 0; t < n_threads; ++t) workers.emplace_back(work);
        for (auto& t : workers) t.join();
    }
    return 0;
}
