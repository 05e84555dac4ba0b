// SPDX-License-Identifier: Apache-2.0
pragma solidity ^0.8.19;

import {TendermintX} from "../src/TendermintX.sol";

/// @notice Foundry deploy script (parity with the reference's
///         contracts/script/Deploy.s.sol:10-26). Reads genesis parameters
///         and function ids from the environment.
/// @dev Requires foundry's forge-std in a real deployment; kept dependency-
///      free here by reading env vars through a minimal cheatcode interface.
interface Vm {
    function envAddress(string calldata) external view returns (address);
    function envUint(string calldata) external view returns (uint256);
    function envBytes32(string calldata) external view returns (bytes32);
    function startBroadcast() external;
    function stopBroadcast() external;
}

contract Deploy {
    Vm constant vm = Vm(address(uint160(uint256(keccak256("hevm cheat code")))));

    function run() external returns (TendermintX deployed) {
        address gateway = vm.envAddress("GATEWAY_ADDRESS");
        uint64 genesisHeight = uint64(vm.envUint("GENESIS_HEIGHT"));
        bytes32 genesisHeader = vm.envBytes32("GENESIS_HEADER");
        bytes32 stepFunctionId = vm.envBytes32("STEP_FUNCTION_ID");
        bytes32 skipFunctionId = vm.envBytes32("SKIP_FUNCTION_ID");

        vm.startBroadcast();
        deployed = new TendermintX(
            gateway,
            genesisHeight,
            genesisHeader,
            stepFunctionId,
            skipFunctionId
        );
        vm.stopBroadcast();
    }
}
