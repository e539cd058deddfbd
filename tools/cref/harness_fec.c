/* .fec byte-format golden harness: reads a .fec file written by
 * lpcnet_tpu.dred.fec_file.write_fec_packets through the REFERENCE reader
 * (training_tf2/fec_packets.c:33-102, compiled in place) and dumps every
 * (packet, subframe) frame plus the per-packet rates as binary f32/i32 so
 * the Python test can assert byte-level compatibility.
 *
 * Usage: harness_fec <file.fec> <num_packets> <subframes> <num_features>
 * Output (stdout, little-endian): per packet: int32 rate, then
 * subframes * num_features float32 frames in C-reader order
 * (subframe_index ascending = file order = time-flipped). */
#include <stdio.h>
#include <stdlib.h>
#include "fec_packets.h"

int main(int argc, char **argv)
{
    if (argc != 5) {
        fprintf(stderr, "usage: %s file.fec num_packets subframes num_features\n", argv[0]);
        return 2;
    }
    const char *path = argv[1];
    int num_packets = atoi(argv[2]);
    int subframes = atoi(argv[3]);
    int num_features = atoi(argv[4]);
    float *frame = malloc(sizeof(float) * num_features);
    for (int p = 0; p < num_packets; p++) {
        int rate = get_fec_rate(path, p);
        if (rate < 0) { fprintf(stderr, "get_fec_rate failed p=%d\n", p); return 1; }
        int32_t r32 = rate;
        fwrite(&r32, sizeof(r32), 1, stdout);
        for (int s = 0; s < subframes; s++) {
            if (get_fec_frame(path, frame, p, s)) {
                fprintf(stderr, "get_fec_frame failed p=%d s=%d\n", p, s);
                return 1;
            }
            fwrite(frame, sizeof(float), num_features, stdout);
        }
    }
    free(frame);
    return 0;
}
