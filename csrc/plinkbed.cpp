// Native PLINK 1.9 .bed decoder for vilma_tpu.
//
// Replaces the reference's third-party libplinkio C dependency
// (reference make_ld_schema.py:6,173-175) with a minimal, fast decoder:
// SNP-major 2-bit genotype records are expanded to int8 genotype counts
// (0/1/2, 3 = missing) with a 256-entry lookup table, one row (SNP) per
// ceil(n_samples/4) input bytes. Exposed via a C ABI for ctypes.
//
// bed format: magic 0x6c 0x1b, mode 0x01 (SNP-major), then per SNP
// packed 2-bit codes: 00 = hom A1 (2 copies of allele1 -> genotype 0 in
// plinkio convention? see below), 01 = missing, 10 = het, 11 = hom A2.
// We emit the libplinkio convention used by the reference: 0 = hom first
// allele, 1 = het, 2 = hom second allele, 3 = missing.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

// Map one packed byte (4 samples) to 4 int8 genotypes.
struct LutEntry { int8_t g[4]; };

const LutEntry* build_lut() {
    static LutEntry lut[256];
    static bool built = false;
    if (!built) {
        for (int b = 0; b < 256; ++b) {
            for (int j = 0; j < 4; ++j) {
                int code = (b >> (2 * j)) & 3;
                int8_t g;
                switch (code) {
                    case 0: g = 0; break;   // hom allele1
                    case 1: g = 3; break;   // missing
                    case 2: g = 1; break;   // het
                    default: g = 2; break;  // hom allele2
                }
                lut[b].g[j] = g;
            }
        }
        built = true;
    }
    return lut;
}

}  // namespace

extern "C" {

// Decode `num_snps` x `num_samples` genotypes from a SNP-major .bed file
// into out[num_snps * num_samples] (row-major, one row per SNP).
// Returns 0 on success; negative error codes otherwise:
//   -1 cannot open, -2 bad magic/mode, -3 truncated file.
int plinkbed_decode(const char* bed_path, int64_t num_samples,
                    int64_t num_snps, int8_t* out) {
    FILE* f = std::fopen(bed_path, "rb");
    if (!f) return -1;
    unsigned char header[3];
    if (std::fread(header, 1, 3, f) != 3
        || header[0] != 0x6c || header[1] != 0x1b || header[2] != 0x01) {
        std::fclose(f);
        return -2;
    }
    const LutEntry* lut = build_lut();
    const int64_t bytes_per_snp = (num_samples + 3) / 4;
    std::vector<unsigned char> buf(bytes_per_snp);
    for (int64_t s = 0; s < num_snps; ++s) {
        if ((int64_t)std::fread(buf.data(), 1, bytes_per_snp, f)
            != bytes_per_snp) {
            std::fclose(f);
            return -3;
        }
        int8_t* row = out + s * num_samples;
        int64_t i = 0;
        for (int64_t b = 0; b + 1 < bytes_per_snp; ++b) {
            const LutEntry& e = lut[buf[b]];
            row[i] = e.g[0]; row[i + 1] = e.g[1];
            row[i + 2] = e.g[2]; row[i + 3] = e.g[3];
            i += 4;
        }
        if (bytes_per_snp > 0) {
            const LutEntry& e = lut[buf[bytes_per_snp - 1]];
            for (int j = 0; j < 4 && i < num_samples; ++j, ++i) {
                row[i] = e.g[j];
            }
        }
    }
    std::fclose(f);
    return 0;
}

}  // extern "C"
