"""Patch a copy of the C++ reference for serial (no-MPI) golden runs.

Implements the recipe in docs/VALIDATION.md: PARALLEL=NONE build with a
local (memcpy) halo exchange and a Model::DumpRawState raw-state dump,
so reference binaries can produce bit-exact golden files without MPI.

Usage:  python patch_serial.py /tmp/refbuild
(run on a fresh copy of /root/reference; idempotent-unsafe — always
start from a pristine copy).
"""
import sys
import os

ROOT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/refbuild"


def sub(path, old, new, count=1):
    p = os.path.join(ROOT, path)
    src = open(p).read()
    n = src.count(old)
    assert n >= count, f"{path}: pattern not found ({n} < {count}):\n{old}"
    open(p, "w").write(src.replace(old, new, count))
    print(f"patched {path}")


# --- build config: serial, no NetCDF --------------------------------------
sub("mk/config.make", "PARALLEL= MPIOMP", "PARALLEL= NONE")
sub("mk/config.make", "NETCDF=   TRUE", "NETCDF=   FALSE")
# vendored NetCDF C++ bindings need netcdf.h even when NETCDF=FALSE
sub("src/base/Makefile",
    "       TimeObj.cpp \\\n\t   netcdf.cpp \\\n\t   ncvalues.cpp",
    "       TimeObj.cpp")

# --- Model: serial patch count + raw state dump ----------------------------
sub("src/atm/Model.cpp",
    """#else
	if (nPatchCount == (-1)) {
		_EXCEPTIONT("Unimplemented: PatchCount must be specified");
	}
#endif""",
    """#else
	if (nPatchCount == (-1)) {
		nPatchCount = 1;
	}
#endif""")

sub("src/atm/Model.cpp",
    "///////////////////////////////////////////////////////////////////"
    "////////////\n\nvoid Model::SetGrid(",
    """///////////////////////////////////////////////////////////////////////////////

#include <cstdio>
#include <cstdint>

void Model::DumpRawState(const char * szFilename) {
	FILE * fp = fopen(szFilename, "wb");
	if (fp == NULL) {
		_EXCEPTIONT("Unable to open raw state dump file");
	}
	for (int n = 0; n < m_pGrid->GetActivePatchCount(); n++) {
		const GridPatch * pPatch = m_pGrid->GetActivePatch(n);
		const DataArray4D<double> & dataNode =
			pPatch->GetDataState(0, DataLocation_Node);
		const DataArray4D<double> & dataREdge =
			pPatch->GetDataState(0, DataLocation_REdge);
		const PatchBox & box = pPatch->GetPatchBox();
		int64_t dims[10];
		dims[0] = dataNode.GetSize(0);
		dims[1] = dataNode.GetSize(1);
		dims[2] = dataNode.GetSize(2);
		dims[3] = dataNode.GetSize(3);
		dims[4] = box.GetAInteriorBegin();
		dims[5] = box.GetAInteriorEnd();
		dims[6] = box.GetBInteriorBegin();
		dims[7] = box.GetBInteriorEnd();
		dims[8] = dataREdge.GetSize(3);
		dims[9] = 0;
		fwrite(dims, sizeof(int64_t), 10, fp);
		fwrite(&(dataNode(0,0,0,0)), sizeof(double),
			dims[0]*dims[1]*dims[2]*dims[3], fp);
		fwrite(&(dataREdge(0,0,0,0)), sizeof(double),
			dims[0]*dims[1]*dims[2]*dims[8], fp);
	}
	fclose(fp);
}

///////////////////////////////////////////////////////////////////////////////

void Model::SetGrid(""")

sub("src/atm/Model.h",
    "	virtual void ComputeErrorNorms();",
    """	virtual void ComputeErrorNorms();

	///	<summary>
	///		Dump raw active state (serial golden-file generation).
	///	</summary>
	void DumpRawState(const char * szFilename);""")

# --- Grid: serial patch distribution + exchange-buffer processors ----------
sub("src/atm/Grid.cpp",
    """		if (iPatchProcessor == nRank) {
			GridPatch * pPatch = NewPatch(n);
			pPatch->InitializeDataLocal();
			m_vecActiveGridPatches.push_back(pPatch);
			m_vecActiveGridPatchIndices.push_back(n);
		}
	}
#endif
}""",
    """		if (iPatchProcessor == nRank) {
			GridPatch * pPatch = NewPatch(n);
			pPatch->InitializeDataLocal();
			m_vecActiveGridPatches.push_back(pPatch);
			m_vecActiveGridPatchIndices.push_back(n);
		}
	}
#else
	// Serial: all patches active on processor 0
	m_vecPatchProcessor.resize(m_aPatchBoxes.GetRows());
	for (int n = 0; n < m_aPatchBoxes.GetRows(); n++) {
		m_vecPatchProcessor[n] = 0;
		GridPatch * pPatch = NewPatch(n);
		pPatch->InitializeDataLocal();
		m_vecActiveGridPatches.push_back(pPatch);
		m_vecActiveGridPatchIndices.push_back(n);
	}
#endif
}""")

sub("src/atm/Grid.cpp",
    """#ifdef TEMPEST_MPIOMP
	// Set up thread ranks for MPI communication
	if (ixSourcePatch >= m_vecPatchProcessor.size()) {""",
    """	// Set up thread ranks for communication
	if (ixSourcePatch >= m_vecPatchProcessor.size()) {""")

sub("src/atm/Grid.cpp",
    """	exbuf.m_ixSourceProcessor = m_vecPatchProcessor[ixSourcePatch];
	exbuf.m_ixTargetProcessor = m_vecPatchProcessor[ixTargetPatch];
#endif""",
    """	exbuf.m_ixSourceProcessor = m_vecPatchProcessor[ixSourcePatch];
	exbuf.m_ixTargetProcessor = m_vecPatchProcessor[ixTargetPatch];""")

sub("src/atm/Grid.h",
    """#ifdef TEMPEST_MPIOMP
	///	<summary>
	///		Vector of processors that contain the specified GridPatch.
	///	</summary>
	std::vector<int> m_vecPatchProcessor;
#endif""",
    """	///	<summary>
	///		Vector of processors that contain the specified GridPatch.
	///	</summary>
	std::vector<int> m_vecPatchProcessor;""")

# --- Connectivity: serial local exchange -----------------------------------
sub("src/atm/Connectivity.cpp",
    '#include "Connectivity.h"',
    '#include "Connectivity.h"\n\n#include <cstring>')

sub("src/atm/Connectivity.cpp",
    """	// Reset all ExchangeBuffers
	for (int r = 0; r < m_vecRegistry.size(); r++) {
		m_vecRegistry[r].Reset();
	}

#ifdef TEMPEST_MPIOMP""",
    """	// Reset all ExchangeBuffers
	for (int r = 0; r < m_vecRegistry.size(); r++) {
		m_vecRegistry[r].Reset();
	}

#ifndef TEMPEST_MPIOMP
	for (int p = 0; p < m_vecProcessors.size(); p++) {
		m_vecMessageReceived[p] = false;
	}
#endif

#ifdef TEMPEST_MPIOMP""")

sub("src/atm/Connectivity.cpp",
    """	// Activate
	m_fActiveAsyncSend = true;
#endif
}""",
    """	// Activate
	m_fActiveAsyncSend = true;
#else
	// Serial local exchange: copy aggregated send buffers straight into
	// the receive buffers; message headers route the slabs on unpack.
	for (int p = 0; p < m_vecProcessors.size(); p++) {
		memcpy(m_vecRecvBuffers[p], m_vecSendBuffers[p],
			m_vecBufferSize[p]);
	}
#endif
}""")

sub("src/atm/Connectivity.cpp",
    """		}
	}
#endif

	return (NULL);
}""",
    """		}
	}
#else
	// Serial: hand back each processor's buffer list exactly once
	for (int p = 0; p < m_vecProcessors.size(); p++) {
		if (m_vecMessageReceived[p]) {
			continue;
		}
		m_vecMessageReceived[p] = true;
		if (!m_vecAreRecvBuffersAttached[p]) {
			AttachRecvBuffers(p);
			m_vecAreRecvBuffersAttached[p] = true;
		}
		return &(m_vecRegistryByProcessor[p]);
	}
#endif

	return (NULL);
}""")

# --- Grid::Checksum: serial branch (whole body is #ifdef TEMPEST_MPIOMP,
#     so serial builds segfault on the unallocated output array) -----------
sub("src/atm/Grid.cpp",
    """	// Take the square root for the L2 norm sum
	if (nRank == 0) {
		if (eChecksumType == ChecksumType_L2) {
			for (int c = 0; c < dChecksums.GetRows(); c++) {
				dChecksums[c] = sqrt(dChecksums[c]);
			}
		}
	}
#endif
}""",
    """	// Take the square root for the L2 norm sum
	if (nRank == 0) {
		if (eChecksumType == ChecksumType_L2) {
			for (int c = 0; c < dChecksums.GetRows(); c++) {
				dChecksums[c] = sqrt(dChecksums[c]);
			}
		}
	}
#else
	// Serial checksum
	if (eDataType == DataType_State) {
		dChecksums.Allocate(m_model.GetEquationSet().GetComponents());
	} else if (eDataType == DataType_Tracers) {
		int nTracers = m_model.GetEquationSet().GetTracers();
		if (nTracers == 0) {
			return;
		}
		dChecksums.Allocate(nTracers);
	} else {
		_EXCEPTIONT("Invalid DataType");
	}
	for (int n = 0; n < m_vecActiveGridPatches.size(); n++) {
		m_vecActiveGridPatches[n]->Checksum(
			eDataType, dChecksums, iDataIndex, eChecksumType);
	}
	if (eChecksumType == ChecksumType_L2) {
		for (int c = 0; c < dChecksums.GetRows(); c++) {
			dChecksums[c] = sqrt(dChecksums[c]);
		}
	}
#endif
}""")

# --- test mains: dump raw state instead of error norms ---------------------
import glob
for f in glob.glob(os.path.join(ROOT, "test/*/*.cpp")):
    src = open(f).read()
    if "model.ComputeErrorNorms();" in src:
        open(f, "w").write(src.replace(
            "model.ComputeErrorNorms();",
            'model.DumpRawState("final_state.bin");'))
        print(f"patched {os.path.relpath(f, ROOT)}")

print("all patches applied")
