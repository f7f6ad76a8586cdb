// Self-contained reader for Alembic (.abc) PolyMesh archives in the Ogawa
// container format — no Alembic SDK required.
//
// Replaces the SDK-backed implementation of the reference tool
// (/root/reference/actorshq/toolbox/mesh_tools/alembic_extractor/main.cpp,
// which builds the full Alembic library as a submodule). This environment
// vendors no SDK, so the subset of the format the extractor actually needs is
// implemented here from the format's structure:
//
// OGAWA CONTAINER (exact, stable since Alembic 1.5)
//   header : "Ogawa" (5 bytes) | frozen u8 (0xff) | version u16 LE | root u64 LE
//   group  : u64 child_count, then child_count x u64 refs.
//            ref MSB set  -> data blob at (ref & ~MSB); ref == MSB -> empty data
//            ref MSB clear-> child group at ref;        ref == 0   -> empty group
//   data   : u64 byte_size, then payload bytes
//
// ABC LAYER (AbcCoreOgawa object/property encoding; the subset below)
//   root group: child 2 = top object group; children 0/1 version ints,
//               3 = archive metadata, 4 = time samplings, 5 = indexed metadata
//               (entries of u8 size + bytes; metadata index i -> i-th entry).
//   object group: child 0 = top compound property group; children 1..N-2 =
//               child object groups; last child = data blob of child headers,
//               each: u32 name_len, name, u8 meta_index (0xff -> u32 len +
//               inline metadata text "key=value;...").
//   compound property group: children 0..N-2 = per-property subtree (group),
//               last child = property-header blob. Each header:
//                 u32 info:
//                   bits 0-1  property type (0 compound, 1 scalar, 2 array)
//                   bits 2-3  size hint (0/1/2 -> u8/u16/u32 index fields)
//                   bits 4-7  POD type (10 = float32, 6 = int32, ...)
//                   bit  8    has explicit time-sampling index
//                   bit  9    index fields omitted (constant 1-sample shortcut)
//                   bit  10   homogenous array
//                   bits 12-19 extent
//                   bits 20-31 metadata index (0xfff -> u32 len + inline text)
//                 then (simple properties, size-hint ints): next_sample_index;
//                 unless bit 9: first_changed_index, last_changed_index;
//                 if bit 8: u32 time_sampling_index.
//                 then u32 name_len + name [+ inline metadata].
//               Sample -> stored-sample mapping: i < first_changed -> 0,
//               i > last_changed -> last stored, else first + (i - first_changed)
//               (first_changed == 0 && last_changed == 0 -> constant).
//   simple property group: scalar sample j = data child j; array sample j =
//               data child 2j (payload) and 2j+1 (u64 dims; empty -> rank 1
//               derived from byte size). Sample payloads are prefixed by a
//               16-byte content-hash key; the value starts at offset 16.
//
//   PolyMesh: object whose metadata contains "AbcGeom_PolyMesh" (or whose
//   ".geom" compound has the trio below); geometry lives in the ".geom"
//   compound: "P" (float32 x3 positions), ".faceIndices" (int32),
//   ".faceCounts" (int32).
//
// Parsing is defensive: malformed/unknown regions raise std::runtime_error
// with the archive path context rather than reading out of bounds.
#pragma once

#include <cstdint>
#include <cstring>
#include <fstream>
#include <map>
#include <memory>
#include <stdexcept>
#include <string>
#include <vector>

namespace abclite {

// ---------------------------------------------------------------- container

class OgawaFile {
  public:
    explicit OgawaFile(const std::string& path) : path_(path) {
        std::ifstream f(path, std::ios::binary | std::ios::ate);
        if (!f) throw std::runtime_error("cannot open " + path);
        const std::streamsize size = f.tellg();
        buf_.resize(static_cast<size_t>(size));
        f.seekg(0);
        f.read(reinterpret_cast<char*>(buf_.data()), size);
        if (buf_.size() < 16 || std::memcmp(buf_.data(), "Ogawa", 5) != 0)
            throw std::runtime_error(path + ": not an Ogawa archive");
        root_ = u64_at(8);
    }

    uint64_t root() const { return root_; }
    const std::string& path() const { return path_; }

    uint64_t u64_at(uint64_t off) const {
        check(off, 8);
        uint64_t v;
        std::memcpy(&v, buf_.data() + off, 8);  // little-endian hosts only
        return v;
    }

    const uint8_t* bytes_at(uint64_t off, uint64_t n) const {
        check(off, n);
        return buf_.data() + off;
    }

  private:
    void check(uint64_t off, uint64_t n) const {
        if (off + n > buf_.size() || off + n < off)
            throw std::runtime_error(path_ + ": truncated archive (read at " +
                                     std::to_string(off) + "+" + std::to_string(n) + ")");
    }

    std::string path_;
    std::vector<uint8_t> buf_;
    uint64_t root_ = 0;
};

constexpr uint64_t kDataBit = 0x8000000000000000ull;

struct Node {
    const OgawaFile* file = nullptr;
    uint64_t ref = 0;  // raw child reference (MSB = data)

    bool is_data() const { return ref & kDataBit; }
    bool is_group() const { return !is_data(); }
    bool empty() const { return (ref & ~kDataBit) == 0; }

    size_t num_children() const {
        if (!is_group() || empty()) return 0;
        return static_cast<size_t>(file->u64_at(ref));
    }
    Node child(size_t i) const {
        if (i >= num_children()) throw std::runtime_error(file->path() + ": child index out of range");
        return Node{file, file->u64_at(ref + 8 + 8 * i)};
    }
    uint64_t data_size() const {
        if (!is_data()) throw std::runtime_error(file->path() + ": not a data node");
        if (empty()) return 0;
        return file->u64_at(ref & ~kDataBit);
    }
    std::vector<uint8_t> data() const {
        const uint64_t n = data_size();
        std::vector<uint8_t> out(n);
        if (n) std::memcpy(out.data(), file->bytes_at((ref & ~kDataBit) + 8, n), n);
        return out;
    }
};

// ------------------------------------------------------------------- cursor

struct Cursor {
    const std::vector<uint8_t>* b;
    size_t pos = 0;
    const std::string* ctx;

    bool done() const { return pos >= b->size(); }
    void need(size_t n) const {
        if (pos + n > b->size()) throw std::runtime_error(*ctx + ": truncated header blob");
    }
    uint8_t u8() { need(1); return (*b)[pos++]; }
    uint16_t u16() { need(2); uint16_t v; std::memcpy(&v, b->data() + pos, 2); pos += 2; return v; }
    uint32_t u32() { need(4); uint32_t v; std::memcpy(&v, b->data() + pos, 4); pos += 4; return v; }
    uint32_t size_hint_int(uint32_t hint) {
        return hint == 0 ? u8() : hint == 1 ? uint32_t(u16()) : u32();
    }
    std::string str(size_t n) {
        need(n);
        std::string s(reinterpret_cast<const char*>(b->data() + pos), n);
        pos += n;
        return s;
    }
};

// ---------------------------------------------------------------- abc layer

struct PropertyHeader {
    std::string name;
    std::string metadata;
    uint32_t type = 0;  // 0 compound, 1 scalar, 2 array
    uint32_t pod = 0;
    uint32_t extent = 1;
    uint32_t num_samples = 0;
    uint32_t first_changed = 0;
    uint32_t last_changed = 0;
    size_t group_child = 0;  // index of this property's subtree in the group

    // Sample index -> stored data index (constant-run compression).
    uint32_t stored_index(uint32_t i) const {
        if (first_changed == 0 && last_changed == 0 && num_samples > 1)
            return 0;  // constant property
        if (i < first_changed) return 0;
        if (last_changed && i > last_changed) i = last_changed;
        return first_changed ? i - first_changed + 1 : i;
    }
};

inline std::string read_metadata_field(Cursor& c, uint32_t index,
                                       const std::vector<std::string>& indexed) {
    if (index == 0xff || index == 0xfff) {  // inline
        const uint32_t n = c.u32();
        return c.str(n);
    }
    if (index < indexed.size()) return indexed[index];
    return "";
}

struct Compound;
using CompoundPtr = std::shared_ptr<Compound>;

struct Compound {
    Node group;
    std::vector<PropertyHeader> headers;

    static CompoundPtr parse(Node group, const std::vector<std::string>& indexed) {
        auto out = std::make_shared<Compound>();
        out->group = group;
        const size_t n = group.num_children();
        if (n == 0) return out;
        Node last = group.child(n - 1);
        if (!last.is_data()) return out;  // no header blob -> no properties
        const std::vector<uint8_t> blob = last.data();
        const std::string& ctx = group.file->path();
        Cursor c{&blob, 0, &ctx};
        size_t child_idx = 0;
        while (!c.done()) {
            PropertyHeader h;
            const uint32_t info = c.u32();
            h.type = info & 0x3;
            const uint32_t hint = (info >> 2) & 0x3;
            h.pod = (info >> 4) & 0xf;
            const bool has_tsidx = info & 0x100;
            const bool no_index_fields = info & 0x200;
            h.extent = (info >> 12) & 0xff;
            const uint32_t meta_index = (info >> 20) & 0xfff;
            if (h.type != 0) {
                if (no_index_fields) {
                    h.num_samples = 1;
                } else {
                    h.num_samples = c.size_hint_int(hint);
                    h.first_changed = c.size_hint_int(hint);
                    h.last_changed = c.size_hint_int(hint);
                }
                if (has_tsidx) c.u32();
            }
            const uint32_t name_len = c.u32();
            h.name = c.str(name_len);
            h.metadata = read_metadata_field(c, meta_index, indexed);
            h.group_child = child_idx++;
            out->headers.push_back(std::move(h));
        }
        return out;
    }

    const PropertyHeader* find(const std::string& name) const {
        for (const auto& h : headers)
            if (h.name == name) return &h;
        return nullptr;
    }

    Node property_node(const PropertyHeader& h) const { return group.child(h.group_child); }
};

// A stored array sample: payload bytes (16-byte hash key stripped).
inline std::vector<uint8_t> read_array_sample(Node prop_group, const PropertyHeader& h, uint32_t i) {
    const uint32_t s = h.stored_index(i);
    const size_t want = size_t(2) * s;  // data child 2s (payload), 2s+1 (dims)
    if (want >= prop_group.num_children())
        throw std::runtime_error(prop_group.file->path() + ": sample " + std::to_string(i) +
                                 " of '" + h.name + "' out of range");
    std::vector<uint8_t> raw = prop_group.child(want).data();
    if (raw.size() < 16)
        throw std::runtime_error(prop_group.file->path() + ": sample blob of '" + h.name +
                                 "' too small for its hash key");
    return std::vector<uint8_t>(raw.begin() + 16, raw.end());
}

struct ObjectNode {
    std::string name;
    std::string metadata;
    Node group;
    CompoundPtr properties;
    std::vector<ObjectNode> children;

    static ObjectNode parse(Node group, std::string name, std::string metadata,
                            const std::vector<std::string>& indexed) {
        ObjectNode obj;
        obj.name = std::move(name);
        obj.metadata = std::move(metadata);
        obj.group = group;
        const size_t n = group.num_children();
        if (n == 0) return obj;
        if (group.child(0).is_group())
            obj.properties = Compound::parse(group.child(0), indexed);

        // Child object headers live in the trailing data blob.
        Node last = group.child(n - 1);
        if (n >= 2 && last.is_data() && last.data_size() > 0) {
            const std::vector<uint8_t> blob = last.data();
            const std::string& ctx = group.file->path();
            Cursor c{&blob, 0, &ctx};
            size_t child_group = 1;
            while (!c.done() && child_group <= n - 2) {
                const uint32_t name_len = c.u32();
                std::string cname = c.str(name_len);
                std::string cmeta = read_metadata_field(c, c.u8(), indexed);
                obj.children.push_back(
                    ObjectNode::parse(group.child(child_group), std::move(cname), std::move(cmeta), indexed));
                ++child_group;
            }
        }
        return obj;
    }
};

struct Archive {
    OgawaFile file;
    std::vector<std::string> indexed_metadata;
    ObjectNode top;

    explicit Archive(const std::string& path) : file(path) {
        Node root{&file, file.root()};
        if (root.num_children() < 3 || !root.child(2).is_group())
            throw std::runtime_error(path + ": missing top object group (root child 2)");
        if (root.num_children() >= 6 && root.child(5).is_data()) {
            const std::vector<uint8_t> blob = root.child(5).data();
            const std::string& ctx = file.path();
            Cursor c{&blob, 0, &ctx};
            while (!c.done()) indexed_metadata.push_back(c.str(c.u8()));
        }
        top = ObjectNode::parse(root.child(2), "ABC", "", indexed_metadata);
    }
};

// ----------------------------------------------------------------- polymesh

struct PolyMesh {
    std::string name;
    const ObjectNode* object = nullptr;
    CompoundPtr geom;
    const PropertyHeader* positions = nullptr;    // "P", float32 x3
    const PropertyHeader* face_indices = nullptr; // ".faceIndices", int32
    const PropertyHeader* face_counts = nullptr;  // ".faceCounts", int32

    uint32_t num_samples() const { return positions ? positions->num_samples : 0; }

    std::vector<float> positions_at(uint32_t i) const {
        std::vector<uint8_t> raw = read_array_sample(geom->property_node(*positions), *positions, i);
        std::vector<float> out(raw.size() / 4);
        std::memcpy(out.data(), raw.data(), out.size() * 4);
        return out;
    }
    std::vector<int32_t> ints_at(const PropertyHeader& h, uint32_t i) const {
        std::vector<uint8_t> raw = read_array_sample(geom->property_node(h), h, i);
        std::vector<int32_t> out(raw.size() / 4);
        std::memcpy(out.data(), raw.data(), out.size() * 4);
        return out;
    }
};

inline void find_poly_meshes(const ObjectNode& obj, std::vector<PolyMesh>& out) {
    const bool schema_says_mesh = obj.metadata.find("AbcGeom_PolyMesh") != std::string::npos;
    if (obj.properties) {
        // The mesh geometry compound: schema metadata on the object, or the
        // characteristic property trio on a ".geom" child compound.
        for (const auto& h : obj.properties->headers) {
            if (h.type != 0) continue;
            auto sub = Compound::parse(obj.properties->property_node(h),
                                       {});  // indexed metadata resolved at parse of names only
            const PropertyHeader* p = sub->find("P");
            const PropertyHeader* fi = sub->find(".faceIndices");
            const PropertyHeader* fc = sub->find(".faceCounts");
            if (p && fi && fc && (schema_says_mesh || h.name == ".geom")) {
                PolyMesh m;
                m.name = obj.name;
                m.object = &obj;
                m.geom = sub;
                m.positions = m.geom->find("P");
                m.face_indices = m.geom->find(".faceIndices");
                m.face_counts = m.geom->find(".faceCounts");
                out.push_back(std::move(m));
                break;
            }
        }
    }
    for (const auto& c : obj.children) find_poly_meshes(c, out);
}

}  // namespace abclite
