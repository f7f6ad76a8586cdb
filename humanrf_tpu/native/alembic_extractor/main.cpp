// Alembic (.abc) animated mesh -> per-frame Frame%06d.obj extractor.
//
// Native (host C++) equivalent of the reference tool
// (/root/reference/actorshq/toolbox/mesh_tools/alembic_extractor/main.cpp): walk
// the archive, sample every IPolyMesh at each frame, write OBJ files with
// async writers.
//
// Requires the Alembic SDK (not vendored in this environment): the CMake build
// skips this target when find_package(Alembic) fails; the mesh_renderer
// consumes OBJ sequences directly.

#include <filesystem>
#include <fstream>
#include <future>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

#include <Alembic/Abc/All.h>
#include <Alembic/AbcCoreOgawa/All.h>
#include <Alembic/AbcGeom/All.h>

namespace fs = std::filesystem;
using namespace Alembic::AbcGeom;

static void find_poly_meshes(const IObject& obj, std::vector<IPolyMesh>& out) {
    for (size_t i = 0; i < obj.getNumChildren(); ++i) {
        IObject child(obj, obj.getChildHeader(i).getName());
        if (IPolyMesh::matches(child.getHeader())) {
            out.emplace_back(child, kWrapExisting);
        }
        find_poly_meshes(child, out);
    }
}

static std::string mesh_to_obj(const IPolyMeshSchema::Sample& sample) {
    std::ostringstream os;
    P3fArraySamplePtr positions = sample.getPositions();
    Int32ArraySamplePtr counts = sample.getFaceCounts();
    Int32ArraySamplePtr indices = sample.getFaceIndices();

    for (size_t i = 0; i < positions->size(); ++i) {
        const auto& p = (*positions)[i];
        os << "v " << p.x << " " << p.y << " " << p.z << "\n";
    }
    size_t offset = 0;
    for (size_t f = 0; f < counts->size(); ++f) {
        const int n = (*counts)[f];
        os << "f";
        // Alembic winds faces clockwise; OBJ expects counter-clockwise.
        for (int k = n - 1; k >= 0; --k) {
            os << " " << ((*indices)[offset + k] + 1);
        }
        os << "\n";
        offset += n;
    }
    return os.str();
}

int convert_alembic_to_objs(const fs::path& abc_path, const fs::path& out_dir) {
    IArchive archive(Alembic::AbcCoreOgawa::ReadArchive(), abc_path.string());
    std::vector<IPolyMesh> meshes;
    find_poly_meshes(archive.getTop(), meshes);
    if (meshes.empty()) {
        std::cerr << "no IPolyMesh found in " << abc_path << "\n";
        return 1;
    }
    IPolyMeshSchema& schema = meshes.front().getSchema();
    const size_t num_samples = schema.getNumSamples();
    std::cout << "Extracting " << num_samples << " frames from " << abc_path << "\n";

    fs::create_directories(out_dir);
    std::vector<std::future<void>> writers;
    for (size_t i = 0; i < num_samples; ++i) {
        IPolyMeshSchema::Sample sample;
        schema.get(sample, ISampleSelector(static_cast<index_t>(i)));
        std::string obj = mesh_to_obj(sample);
        char name[32];
        std::snprintf(name, sizeof(name), "Frame%06zu.obj", i);
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
    return convert_alembic_to_objs(alembic_file, output_directory);
}
