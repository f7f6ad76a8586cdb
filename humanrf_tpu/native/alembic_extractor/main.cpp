// Alembic (.abc) animated mesh -> per-frame Frame%06d.obj extractor.
//
// Native (host C++) equivalent of the reference tool
// (/root/reference/actorshq/toolbox/mesh_tools/alembic_extractor/main.cpp):
// walk the archive, sample every PolyMesh at each frame, write OBJ files with
// async writers. The reference builds the whole Alembic SDK as a submodule;
// this tool instead reads the Ogawa/PolyMesh subset directly (abc_ogawa.hpp)
// and therefore builds everywhere with a bare C++17 toolchain.

#include <cstdio>
#include <filesystem>
#include <fstream>
#include <future>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

#include "abc_ogawa.hpp"

namespace fs = std::filesystem;

static std::string mesh_to_obj(const std::vector<float>& positions,
                               const std::vector<int32_t>& counts,
                               const std::vector<int32_t>& indices) {
    std::ostringstream os;
    for (size_t i = 0; i + 2 < positions.size(); i += 3) {
        os << "v " << positions[i] << " " << positions[i + 1] << " " << positions[i + 2] << "\n";
    }
    size_t offset = 0;
    for (size_t f = 0; f < counts.size(); ++f) {
        const int n = counts[f];
        os << "f";
        // Alembic winds faces clockwise; OBJ expects counter-clockwise.
        for (int k = n - 1; k >= 0; --k) {
            os << " " << (indices[offset + k] + 1);
        }
        os << "\n";
        offset += n;
    }
    return os.str();
}

int convert_alembic_to_objs(const fs::path& abc_path, const fs::path& out_dir) {
    abclite::Archive archive(abc_path.string());
    std::vector<abclite::PolyMesh> meshes;
    abclite::find_poly_meshes(archive.top, meshes);
    if (meshes.empty()) {
        std::cerr << "no PolyMesh found in " << abc_path << "\n";
        return 1;
    }
    const abclite::PolyMesh& mesh = meshes.front();
    const uint32_t num_samples = mesh.num_samples();
    std::cout << "Extracting " << num_samples << " frames from " << abc_path << " (mesh '"
              << mesh.name << "')\n";

    fs::create_directories(out_dir);
    std::vector<std::future<void>> writers;
    for (uint32_t i = 0; i < num_samples; ++i) {
        std::vector<float> positions = mesh.positions_at(i);
        // Match the reference extractor's output file set: frames whose
        // position array is empty produce no Frame%06u.obj at all.
        if (positions.empty()) continue;
        std::string obj = mesh_to_obj(positions, mesh.ints_at(*mesh.face_counts, i),
                                      mesh.ints_at(*mesh.face_indices, i));
        char name[32];
        std::snprintf(name, sizeof(name), "Frame%06u.obj", i);
        fs::path out_path = out_dir / name;
        writers.emplace_back(std::async(std::launch::async, [out_path, obj = std::move(obj)]() {
            std::ofstream f(out_path);
            f << obj;
        }));
    }
    for (auto& w : writers) w.wait();
    return 0;
}

int main(int argc, char** argv) {
    std::string alembic_file, output_directory;
    for (int i = 1; i < argc; ++i) {
        std::string arg = argv[i];
        if (arg == "--alembic" && i + 1 < argc) alembic_file = argv[++i];
        else if (arg == "--output" && i + 1 < argc) output_directory = argv[++i];
        else {
            std::cerr << "unknown argument: " << arg << "\n";
            return 2;
        }
    }
    if (alembic_file.empty() || output_directory.empty()) {
        std::cerr << "usage: alembic_extractor --alembic mesh.abc --output <dir>\n";
        return 2;
    }
    try {
        return convert_alembic_to_objs(alembic_file, output_directory);
    } catch (const std::exception& e) {
        std::cerr << "error: " << e.what() << "\n";
        return 1;
    }
}
